"""Aggregate device-side op time from a jax.profiler perfetto trace.

Usage: python dev/parse_trace.py <trace_dir> [nsteps] [hlo_dump.txt]
With an HLO dump (dev/dump_hlo.py), joins each fusion's time to its
metadata op_name so the table reads as model-level attribution.
"""

import gzip
import glob
import json
import re
import sys
from collections import defaultdict


def hlo_op_names(path):
    """fusion.N -> "op_name | shape" from an HLO text dump. Ops without
    metadata still get their output shape so nothing stays opaque.
    Handles tuple-shaped outputs (multi-output fusions), which the earlier
    single-token shape regex silently skipped."""
    out = {}
    pat_line = re.compile(r"^\s*(?:ROOT )?%(\S+) = (.*)$")
    pat_meta = re.compile(r"metadata={op_name=\"([^\"]*)\"")
    with open(path) as f:
        for line in f:
            m = pat_line.match(line)
            if not m:
                continue
            name, rest = m.groups()
            mm = pat_meta.search(rest)
            op = mm.group(1) if mm else "?"
            # shape = everything before the opcode's '(' with layout
            # annotations stripped; tolerate tuple shapes with nested parens
            shape = re.sub(r"{[^{}]*}", "", rest.split("(%")[0])[:80]
            out.setdefault(name, f"{op} | {shape}")
    return out


def main():
    trace_dir = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    tmin, tmax = float("inf"), 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_names = {}
        tid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
        print("processes:", pid_names)
        device_pids = {
            p
            for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower() or "Device" in n
        }
        # fall back: any pid whose threads look like XLA op streams
        if not device_pids:
            print("thread names sample:", list(tid_names.items())[:20])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if ev.get("pid") not in device_pids:
                continue
            tname = tid_names.get((ev["pid"], ev["tid"]), "")
            if "step" in tname.lower():
                continue  # step markers, not ops
            name = ev.get("name", "?")
            if name.startswith("jit_train_step"):
                continue  # container event: double-counts its children
            dur = ev.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
            ts = ev.get("ts", 0)
            tmin = min(tmin, ts)
            tmax = max(tmax, ts + ev.get("dur", 0))

    span = (tmax - tmin) / 1e3 if tmax > tmin else 0.0
    print(
        f"\n=== device busy {total:.1f} ms over {span:.1f} ms span "
        f"({nsteps} steps -> {total/nsteps:.1f} ms busy/step) ==="
    )
    names = {}
    if len(sys.argv) > 3:
        names = hlo_op_names(sys.argv[3])
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        op = names.get(name, "")
        # shorten jit(train_step)/... prefixes for readability
        op = op.replace("jit(train_step)/", "").replace(
            "transpose(jvp(TripleDNet))", "BWD"
        ).replace("jvp(TripleDNet)", "FWD")[:110]
        print(f"{ms/nsteps:10.2f} ms/step  x{cnt[name]//nsteps:<4} {name[:28]:28s} {op}")

    # category roll-up by op_name keyword
    if names:
        cats = defaultdict(float)
        for name, ms in agg.items():
            op = names.get(name, "")
            if name.startswith("TripleDNet._compute_losses"):
                # Mosaic (Pallas) kernels show up under their op_name
                cats["pallas photometric"] += ms
            elif "grid_sample" in op or "take_along_axis" in op or "/gather" in op:
                cats["warp gather"] += ms
            elif "conv" in op.lower() or "Conv" in op:
                cats["conv"] += ms
            elif "_compute_losses" in op:
                cats["loss elementwise"] += ms
            elif op:
                cats["other attributed"] += ms
            else:
                cats["unattributed"] += ms
        print("\n=== category roll-up (ms/step) ===")
        for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{v/nsteps:10.2f}  {k}")


if __name__ == "__main__":
    main()
