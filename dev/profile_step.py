"""Profile one bench config's train step on the real TPU and print the
top device-time sinks (VERDICT r2 item 2).

Usage:  python dev/profile_step.py [mono_fm|flagship] [batch]

Captures a jax.profiler trace of 3 steps (after warmup) and aggregates
device-side events from the perfetto trace json.
"""

import gzip
import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mono_fm"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if which == "mono_fm" else 8)

    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import bench

    # SAME config builders as bench.py (VERDICT r3 item 1: published
    # profiles must match the bench operating point). Env flags
    # (BENCH_BF16/BENCH_BLOCK_WARP/...) behave exactly as in bench.py.
    cfg = bench.mono_fm_cfg() if which == "mono_fm" else bench.flagship_cfg()

    state, step, inputs = bench._build(cfg, batch)
    rng = jax.random.PRNGKey(0)
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    print(f"warmup done in {time.perf_counter()-t0:.1f}s loss={float(metrics['loss']):.4f}", flush=True)

    # honest step time
    t0 = time.perf_counter()
    NSTEP = 3
    for _ in range(NSTEP):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / NSTEP
    print(f"step time: {dt*1e3:.1f} ms  ({batch/dt:.2f} imgs/s) loss={loss:.4f}", flush=True)

    trace_dir = f"/tmp/prof_{which}_b{batch}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
        print("processes:", pid_names, flush=True)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if ev.get("pid") not in device_pids:
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            cnt[name] += 1
            total += dur

    print(f"\n=== device time by op (3 steps, total {total:.1f} ms) ===")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms/3:10.2f} ms/step  x{cnt[name]//3:<4} {name[:140]}")


if __name__ == "__main__":
    main()
