"""Bench the PRODUCTION mesh path once (VERDICT r3 item 8): bench.py times
a bare `make_train_step`; the real trainer (train/loop.py:69-110) runs the
same jitted step with the state replicated over a `make_mesh()` mesh and
batches sharded by `shard_batch`. On one chip the mesh is 1-device — this
measures that the sharding machinery adds no step-time overhead, the
single-chip analogue of the DDP wrapper it replaces
(`/root/reference/mono/apis/trainer.py:158-159`).

Usage: python dev/mesh_overhead_bench.py [batch=16] [steps=20]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402

from tripled_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    replicated_sharding,
    shard_batch,
)


def _time_steps(step, state, inputs, rng, steps):
    # warmup/compile
    state, metrics = step(state, inputs, rng)
    float(metrics["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            rng, r = jax.random.split(rng)
            state, metrics = step(state, inputs, r)
        loss = float(metrics["loss"])  # forced readback closes the window
        times.append(time.perf_counter() - t0)
        assert np.isfinite(loss)
    return min(times) / steps * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = bench.mono_fm_cfg()

    state, step, inputs = bench._build(cfg, batch)
    rng = jax.random.PRNGKey(0)
    # host copy BEFORE timing: the bench step donates its state, so the
    # first bare call deletes the original device buffers and the mesh
    # path below must start from a fresh transfer
    state_host = jax.tree_util.tree_map(np.asarray, state)
    bare_ms = _time_steps(step, state, inputs, rng, steps)
    print(f"bare step         : {bare_ms:8.1f} ms/step "
          f"({batch / bare_ms * 1e3:.2f} imgs/s)")

    mesh = make_mesh()
    state_m = jax.device_put(state_host, replicated_sharding(mesh))
    inputs_m = shard_batch({k: np.asarray(v) for k, v in inputs.items()}, mesh)
    mesh_ms = _time_steps(step, state_m, inputs_m, rng, steps)
    print(f"mesh-sharded step : {mesh_ms:8.1f} ms/step "
          f"({batch / mesh_ms * 1e3:.2f} imgs/s)  "
          f"[mesh={mesh.shape}]")
    print(f"overhead: {(mesh_ms / bare_ms - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
