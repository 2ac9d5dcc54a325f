"""Measure the reference torch implementation's training throughput on this
host's CPU torch, producing the measured `vs_baseline` denominator for
bench.py (VERDICT r1 item: replace the assumed-10-imgs/s constant).

The reference publishes no numbers (BASELINE.md) and no GPU exists in this
environment, so the honest measurable baseline is the reference's own
forward+backward on identical configs on this host. Results are written to
REF_TORCH_CPU_BASELINE.json with full provenance so bench.py can report a
measured, clearly-labelled ratio.

Usage: python -m tripled_tpu.cli.bench_ref_torch [--steps 2] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time

import numpy as np
import torch


def make_inputs(b, h, w, with_mask=False, seed=0):
    g = torch.Generator().manual_seed(seed)
    inputs = {}
    for fid in (0, -1, 1):
        inputs[("color", fid, 0)] = torch.rand(b, 3, h, w, generator=g)
        inputs[("color_aug", fid, 0)] = torch.rand(b, 3, h, w, generator=g)
    K = torch.eye(4).repeat(b, 1, 1)
    K[:, 0, 0] = 0.58 * w
    K[:, 1, 1] = 1.92 * h
    K[:, 0, 2] = w / 2
    K[:, 1, 2] = h / 2
    inputs["K"] = K
    inputs["inv_K"] = torch.inverse(K)
    for s in range(4):
        Ks = K.clone()
        Ks[:, :2] /= 2**s
        inputs[("K", s)] = Ks
        inputs[("inv_K", s)] = torch.inverse(Ks)
    if with_mask:
        mask = torch.ones(b, 1, h, w)
        # KITTIRAWDatasetInpaint erase rectangles (kitti_dataset.py erase
        # transform): 16 random 16x16 holes
        rng = np.random.RandomState(seed)
        for _ in range(16):
            i = rng.randint(0, h - 16)
            j = rng.randint(0, w - 16)
            mask[:, :, i : i + 16, j : j + 16] = 0.0
        inputs[("mask", 0, 0)] = mask
    return inputs


def bench_config(name, *, height, width, batch, steps, extra=None):
    from tripled_tpu.utils.ref_loader import build_ref_model, default_opts

    opts = default_opts(
        name,
        height=height,
        width=width,
        imgs_per_gpu=batch,
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        **(extra or {}),
    )
    model = build_ref_model(opts)
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-4)
    with_mask = "inpaint" in name
    inputs = make_inputs(batch, height, width, with_mask=with_mask)

    def one_step():
        optim.zero_grad()
        _, losses = model(inputs)
        # mirror the reference's parse_losses (mono/apis/trainer.py:39-48)
        total = sum(
            v.mean() if isinstance(v, torch.Tensor)
            else sum(x.mean() for x in v)
            for v in losses.values()
        )
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 35.0)
        optim.step()
        return float(total.detach())

    one_step()  # warmup (allocator, lazy init)
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = one_step()
    dt = time.perf_counter() - t0
    ips = batch * steps / dt
    return {
        "imgs_per_sec": round(ips, 4),
        "sec_per_step": round(dt / steps, 3),
        "batch": batch,
        "steps_timed": steps,
        "last_loss": round(loss, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "../..",
                             "REF_TORCH_CPU_BASELINE.json"),
    )
    ap.add_argument("--skip_flagship", action="store_true")
    args = ap.parse_args()

    torch.manual_seed(0)
    results = {
        "provenance": {
            "what": "reference torch (/root/reference) full train step "
            "(fwd+bwd+clip35+Adam) on host CPU",
            "why": "reference publishes no numbers; no GPU in environment "
            "(BASELINE.md); this is the only measurable torch baseline",
            "torch": torch.__version__,
            "host": platform.processor() or platform.machine(),
            "cpu_count": os.cpu_count(),
            "date": time.strftime("%Y-%m-%d"),
        },
        "configs": {},
    }

    # mono_fm R50 @192x640 — the bench.py primary geometry
    results["configs"]["mono_fm_r50_192x640"] = bench_config(
        "mono_fm", height=192, width=640, batch=1, steps=args.steps
    )
    print(json.dumps(results["configs"]["mono_fm_r50_192x640"]))

    if not args.skip_flagship:
        # TripleD flagship @320x1024 (cfg_kitti_tripleD.py:5-7,23-53)
        results["configs"]["tripleD_r50_320x1024"] = bench_config(
            "mono_fm_joint_inpaint_disentangle",
            height=320,
            width=1024,
            batch=1,
            steps=max(1, args.steps // 2),
            extra=dict(
                dis=1e-3,
                cvt=1e-3,
                auto_res_weight=5e-3,
                disentangle_layers=[False, False, False, False, True],
                skip_connection_multiplier=1,
                depth_skip_type=None,
                color_skip_type=None,
                color_skip_layers=[False, False, False, False],
                depth_use_shuffle=False,
                depth_disentangle_type="use_half",
                freeze_extractor=False,
            ),
        )
        print(json.dumps(results["configs"]["tripleD_r50_320x1024"]))

    out = os.path.abspath(args.out)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
