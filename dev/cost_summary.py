"""Print XLA cost_analysis (flops, bytes accessed) + the implied
speed-of-light step time for a bench config, to separate "compute-bound"
from "HBM-bound" honestly (VERDICT r3 item 1 wall analysis).

Usage: python dev/cost_summary.py [mono_fm|flagship] [batch]
Env flags as in bench.py.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

import bench  # noqa: E402

# v5e: 197 TFLOP/s bf16 peak; HBM ~819 GB/s
PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mono_fm"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (
        16 if which == "mono_fm" else 8
    )
    cfg = bench.mono_fm_cfg() if which == "mono_fm" else bench.flagship_cfg()
    state, step, inputs = bench._build(cfg, batch)
    compiled = step.lower(state, inputs, jax.random.PRNGKey(0)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    byt = cost.get("bytes accessed", 0.0)
    print(f"config={which} batch={batch}")
    print(f"flops/step          : {flops/1e12:.3f} TFLOP")
    print(f"bytes accessed/step : {byt/1e9:.2f} GB")
    print(f"  breakdown keys    : "
          + ", ".join(f"{k}={v/1e9:.2f}GB" for k, v in sorted(cost.items())
                      if k.startswith("bytes accessed") and v > 1e9))
    t_flops = flops / (PEAK_TFLOPS * 1e12)
    t_hbm = byt / (HBM_GBPS * 1e9)
    print(f"speed-of-light: MXU {t_flops*1e3:.1f} ms | HBM {t_hbm*1e3:.1f} ms "
          f"-> bound: {'HBM' if t_hbm > t_flops else 'MXU'}")
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                print(f"{k}: {v/1e9:.2f} GB")


if __name__ == "__main__":
    main()
