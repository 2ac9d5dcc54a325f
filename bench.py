"""Benchmark: training throughput (imgs/sec) of the mono_fm config
(ResNet-50 depth / ResNet-18 pose, 192×640 — `config/cfg_kitti_fm.py`
geometry at the bs-12 benchmark shape from BASELINE.json) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is vs. the reference PyTorch baseline; the reference publishes
no numbers (BASELINE.md), so until a measured baseline lands in
BASELINE.json this reports the ratio to a conservative 10 imgs/sec/GPU
stand-in for the 4-GPU FeatDepth setup (≥3× that is the north-star target).

Env overrides: BENCH_BATCH (default 24 — the single-chip sweet spot:
bs12→1719, bs24→3700 imgs/s, bs48 OOMs), BENCH_STEPS (default 20),
BENCH_MODE=train|infer, BENCH_PALLAS=1.
"""

import json
import os
import time

import numpy as np

ASSUMED_PYTORCH_BASELINE_IMGS_PER_SEC = 10.0


def _build(batch, height, width):
    import jax

    from tripled_tpu.config import ModelConfig, OptimConfig
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    cfg = ModelConfig(
        name="mono_fm",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        height=height,
        width=width,
        perception_weight=1e-3,
        use_pallas_photometric=os.environ.get("BENCH_PALLAS", "0") == "1",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    model = build_model(cfg)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=2), steps_per_epoch=100)

    rng = np.random.RandomState(0)
    K = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    K[:, 0, 0] = 0.58 * width
    K[:, 1, 1] = 1.92 * height
    K[:, 0, 2] = 0.5 * width
    K[:, 1, 2] = 0.5 * height
    inputs = {
        "color": np.asarray(rng.rand(batch, 3, height, width, 3), np.float32),
        "color_aug": np.asarray(rng.rand(batch, 3, height, width, 3), np.float32),
        "K": K,
        "inv_K": np.linalg.inv(K).astype(np.float32),
    }
    inputs = jax.device_put(inputs)
    state = create_train_state(model, tx, inputs, seed=0)
    step = make_train_step(model, tx, donate=True)
    return model, state, step, inputs


def bench_train(batch=12, height=192, width=640, steps=20):
    import jax

    model, state, step, inputs = _build(batch, height, width)
    rng = jax.random.PRNGKey(0)

    # warmup / compile
    for _ in range(3):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(steps):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def bench_infer(height=192, width=640, steps=50):
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODE", "train")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "24"))
    if mode == "infer":
        fps = bench_infer(steps=max(steps, 20))
        print(
            json.dumps(
                {
                    "metric": "infer_fps_640x192_tripleD_r50",
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / ASSUMED_PYTORCH_BASELINE_IMGS_PER_SEC, 3),
                }
            )
        )
        return
    while batch >= 1:
        try:
            ips = bench_train(batch=batch, steps=steps)
            break
        except Exception as e:  # OOM fallback
            oom = ("RESOURCE_EXHAUSTED" in str(e)
                   or "Ran out of memory" in str(e))
            if oom and batch > 1:
                batch //= 2
                continue
            raise
    print(
        json.dumps(
            {
                "metric": f"train_imgs_per_sec_mono_fm_r50_bs{batch}_192x640",
                "value": round(ips, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(
                    ips / ASSUMED_PYTORCH_BASELINE_IMGS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
