"""Dump the compiled HLO of a bench config's train step and print the
definitions of named fusions (to map profiler fusion.N -> HLO ops)."""

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import bench  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "mono_fm"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if which == "mono_fm" else 8)

    # SAME config builders as bench.py so the dump matches the bench
    # operating point (env flags behave exactly as in bench.py)
    cfg = bench.mono_fm_cfg() if which == "mono_fm" else bench.flagship_cfg()

    state, step, inputs = bench._build(cfg, batch)
    compiled = step.lower(state, inputs, jax.random.PRNGKey(0)).compile()
    txt = compiled.as_text()
    out = f"/tmp/hlo_{which}_b{batch}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")

    # print the root op line of each fusion computation named fusion[.N]
    # fusions appear as: %fusion.N = ... fusion(...), kind=..., calls=%fused_computation.N
    for m in re.finditer(r"^\s*%?fusion(\.\d+)? = .*$", txt, re.M):
        line = m.group(0).strip()
        print(line[:300])


if __name__ == "__main__":
    main()
