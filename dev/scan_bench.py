"""Honest re-run of the r1/r2 'lax.scan over train steps is 77x slower'
negative result (VERDICT r2 item 3a) — that number came from the broken
clock. Times K plain dispatches vs one lax.scan(K) dispatch of the same
mono_fm train step, both ending in a forced scalar readback.

Usage: python dev/scan_bench.py [batch] [K]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import bench
from tripled_tpu.config import ModelConfig


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = ModelConfig(
        name="mono_fm",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        height=192,
        width=640,
        perception_weight=1e-3,
        remat=True,
    )
    state, step, inputs = bench._build(cfg, batch)

    rng = jax.random.PRNGKey(0)
    print("compiling plain step...", flush=True)
    for _ in range(2):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(K):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    loss = float(metrics["loss"])
    plain = (time.perf_counter() - t0) / K
    print(f"plain loop : {plain*1e3:8.1f} ms/step (loss {loss:.4f})", flush=True)

    # one dispatch running K steps via lax.scan; same step function body
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.step import make_train_step
    from tripled_tpu.config import OptimConfig

    model = build_model(cfg)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=2), steps_per_epoch=100)
    inner = make_train_step(model, tx, donate=False)

    def body(carry, r):
        st, = carry
        st, m = inner(st, inputs, r)
        return (st,), m["loss"]

    @jax.jit
    def scan_steps(st, rngs):
        (st,), losses = jax.lax.scan(body, (st,), rngs)
        return st, losses

    print("compiling scan...", flush=True)
    rngs = jax.random.split(jax.random.PRNGKey(1), K)
    st2, losses = scan_steps(state, rngs)
    float(losses[-1])

    t0 = time.perf_counter()
    st2, losses = scan_steps(st2, rngs)
    loss = float(losses[-1])
    scan_t = (time.perf_counter() - t0) / K
    print(f"lax.scan({K}): {scan_t*1e3:8.1f} ms/step (loss {loss:.4f})", flush=True)
    print(f"ratio scan/plain = {scan_t/plain:.2f}", flush=True)


if __name__ == "__main__":
    main()
