"""Per-component HBM byte ledger for a bench config's train step.

The round-4 wall analysis proved the step HBM-bound (203 GB accessed vs
4.89 TFLOP — dev/cost_summary.py); this tool answers "WHO moves those
bytes" (VERDICT r4 item 2): it walks the ENTRY computation of the
optimized HLO dump (dev/dump_hlo.py) and charges every top-level
instruction output + operand bytes (the same accounting XLA's
cost_analysis uses per fusion: each operand is read once from HBM, the
output written once — on-chip reuse inside a fusion is free), grouped by
the metadata op_name into the model-level components of the round-4
time profile.

Usage:
  python dev/dump_hlo.py mono_fm 16       # writes /tmp/hlo_mono_fm_b16.txt
  python dev/byte_ledger.py /tmp/hlo_mono_fm_b16.txt [top_n]

Caveats: operand bytes are charged even when XLA proves a read partial
(dynamic-slice reads only its window) — matching cost_analysis's own
over-estimate; parameters/constants are charged at each use (they are
re-read per consumer unless the consumer fuses).
"""

import re
import sys
from collections import defaultdict

ITEMSIZE = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str):
    """Total bytes of a shape string, incl. tuple shapes."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.groups()
        if dt not in ITEMSIZE:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * ITEMSIZE[dt]
    return total


_LINE_RE = re.compile(r"^\s*(?:ROOT\s+)?(%?[\w.\-]+) = (.*)$")
_META_RE = re.compile(r'metadata={op_name="([^"]*)"')
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse(path):
    """Returns (entry_instructions, name->output_shape_str)."""
    shapes = {}
    entry = []
    in_entry = False
    with open(path) as f:
        for line in f:
            if line.startswith("ENTRY"):
                in_entry = True
                continue
            if in_entry and line.startswith("}"):
                in_entry = False
            m = _LINE_RE.match(line)
            if not m:
                continue
            name, rest = m.groups()
            name = name.lstrip("%")
            # opcode follows the (possibly tuple-/layout-annotated) result
            # shape: the first lowercase token followed by '(' after a
            # shape/layout closer (plain `split("(")` would cut inside the
            # layout's tiling parens and lose tuple results entirely)
            opcode_m = re.search(r"[\]\}\)]\s+([a-z][\w\-]*)\(", rest)
            head = rest[: opcode_m.start() + 1] if opcode_m else rest
            shapes[name] = head
            if in_entry:
                mm = _META_RE.search(rest)
                opname = mm.group(1) if mm else ""
                opcode = opcode_m.group(1) if opcode_m else "?"
                call = rest[opcode_m.end() :] if opcode_m else ""
                call = call.split("), ")[0] if "), " in call else call
                operands = _OPERAND_RE.findall(call)
                vmem = "S(1)" in head or "S(2)" in head
                entry.append((name, head, opcode, operands, opname, vmem))
    return entry, shapes


def categorize(name, opcode, opname):
    o = opname
    bwd = "transpose(jvp" in o
    if "pallas_call" in o or (
        opcode == "custom-call" and name.startswith("TripleDNet.")
    ):
        # Mosaic kernels carry pallas_call metadata / scope-named results;
        # conv custom-calls (TPU convs lower to custom-call too!) fall
        # through to the conv branch below
        return "pallas photometric kernel"
    if opcode == "custom-call" and ("conv" in o.lower()):
        return f"conv {'BWD' if bwd else 'FWD'}"
    tag = "BWD" if bwd else "FWD"
    if "_warp_colors" in o or ("_grid_sample" in o and "color" in o):
        part = "gather" if opcode == "gather" else (
            "copy" if opcode in ("copy", "concatenate", "pad", "transpose", "reshape", "bitcast") else "elementwise"
        )
        return f"warp colors {tag} {part}"
    if "_warp_features" in o:
        part = "gather" if opcode == "gather" else (
            "copy" if opcode in ("copy", "concatenate", "pad", "transpose", "reshape", "bitcast") else "elementwise"
        )
        return f"warp features {tag} {part}"
    if "grid_sample" in o or opcode == "gather":
        return f"warp other {tag} {opcode}"
    if "conv" in o.lower() or "convolution" in opcode:
        return f"conv {tag}"
    if "_compute_losses" in o:
        # XLA-side photometric prep (pad/transpose into planar slabs) vs
        # generic loss math
        if opcode in ("pad", "transpose", "copy", "concatenate", "reshape"):
            return f"loss {tag} copy/pad (incl. pallas slab prep)"
        return f"loss {tag} elementwise"
    if "adam" in o or "opt_update" in o or "clip" in o:
        return "optimizer"
    if "batch_norm" in o or "bn" in o.lower():
        return f"batchnorm {tag}"
    if "reduce_window" in opcode or "select-and-scatter" in opcode:
        return f"pool {tag}"
    if opcode in ("copy", "transpose", "bitcast", "reshape", "pad", "concatenate"):
        return f"layout/copy {tag}"
    if not o:
        return f"unattributed {opcode}"
    return f"other {tag}"


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    entry, shapes = parse(path)

    # HBM-traffic model: an instruction reads HBM for each operand whose
    # PRODUCER result lives in HBM (operands staged to VMEM by async
    # prefetches/ConcatBitcast were paid for at the prefetch, which we
    # charge to the eventual consumer's component via this same rule —
    # the *-start op reads the HBM source), and writes HBM iff its own
    # result lives in HBM. Matches cost_analysis's totals within ~15%.
    in_vmem = {n: v for n, _, _, _, _, v in entry}
    for name, head, opcode, operands, opname, vmem in entry:
        if opcode in ("copy-done", "async-done", "slice-done"):
            in_vmem[name] = True

    comp_bytes = defaultdict(float)
    rows = []
    total = 0.0
    for name, head, opcode, operands, opname, vmem in entry:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "copy-done", "async-done", "slice-done"):
            continue  # bookkeeping; no fresh HBM traffic of their own
        if opcode in ("copy-start", "async-start", "slice-start"):
            # HBM->VMEM prefetch: moved bytes = the smallest non-scalar
            # tuple element (the destination; slice-start moves a slice,
            # not its full source operand)
            sizes = [
                shape_bytes(m.group(0))
                for m in _SHAPE_RE.finditer(head)
                if shape_bytes(m.group(0)) > 256
            ]
            b = min(sizes) if sizes else 0
            cat = "vmem-prefetch HBM reads (operand staging for consumers)"
        else:
            out_b = 0 if vmem else shape_bytes(head)
            in_b = sum(
                shape_bytes(shapes.get(op, ""))
                for op in operands
                if not in_vmem.get(op, False)
            )
            b = out_b + in_b
            cat = categorize(name, opcode, opname)
        if b == 0:
            continue
        comp_bytes[cat] += b
        total += b
        rows.append((b, name, opcode, head.strip()[:60], opname[-70:]))

    print(f"total bytes accessed (entry-level sum): {total/1e9:.1f} GB")
    print("\n=== per-component ledger (GB/step) ===")
    for cat, b in sorted(comp_bytes.items(), key=lambda kv: -kv[1]):
        print(f"{b/1e9:8.2f} GB  {100*b/total:5.1f}%  {cat}")

    print(f"\n=== top {top_n} single instructions ===")
    for b, name, opcode, head, opname in sorted(rows, key=lambda r: -r[0])[:top_n]:
        print(f"{b/1e9:8.2f} GB  {opcode:14s} {head:60s} {opname}")


if __name__ == "__main__":
    main()
