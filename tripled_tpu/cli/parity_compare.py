"""Metric-parity evidence: train the REFERENCE torch model and the
tripled_tpu model on the SAME batches from the same (synthetic-KITTI)
dataset, evaluate both through the SAME Eigen protocol
(`scripts/eval_depth.py:82-108` semantics), and report the 7-metric table
side by side with % deltas.

No real KITTI is reachable in this environment (zero egress), so per
VERDICT r1 item 2 this compares *metric trajectories on identical data*:
reference torch on host CPU vs tripled_tpu on the attached device. Both
runs share: batch stream (pre-generated, byte-identical), Adam(1e-4) with
grad-clip 35 and the mmcv linear-warmup schedule, loss config
(automask + disp_norm + smoothness 1e-3), and the reference's actual warp
convention (warp_align_corners=False).

Usage:
  python -m tripled_tpu.cli.parity_compare --steps 300 --eval_every 100 \
      --out PARITY_TRAIN.json
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_fixture(root, height, width, num_frames=40, scene="translate"):
    from tripled_tpu.data.synthetic import make_kitti_tree

    if not os.path.isdir(os.path.join(root, "2011_09_26")):
        make_kitti_tree(
            root, num_frames=num_frames, height=height, width=width,
            scene=scene,
        )
    os.environ["TRIPLED_SPLITS_DIR"] = os.path.join(root, "splits")
    return root


def make_datasets(root, height, width, name="kitti", erase_count=0):
    import dataclasses

    from tripled_tpu.config import DataConfig
    from tripled_tpu.data.get_dataset import get_dataset

    data_cfg = DataConfig(
        name=name,
        split="synthetic",
        height=height,
        width=width,
        in_path=root,
        gt_depth_path=os.path.join(root, "gt_depths.npz"),
        erase_count=erase_count,
    )
    train_ds = get_dataset(data_cfg, training=True)
    val_ds = get_dataset(data_cfg, training=False)
    return train_ds, val_ds


def gen_batches(train_ds, batch, steps, seed=7):
    """Deterministic batch stream both frameworks consume verbatim."""
    n = len(train_ds)
    order_rng = np.random.RandomState(seed)
    batches = []
    idx_stream = []
    while len(idx_stream) < steps * batch:
        perm = order_rng.permutation(n)
        idx_stream.extend(perm.tolist())
    for s in range(steps):
        idx = idx_stream[s * batch : (s + 1) * batch]
        samples = [
            train_ds.sample(i, np.random.RandomState(seed * 100003 + s * 1009 + i))
            for i in idx
        ]
        keys = ["color", "color_aug", "K", "inv_K"]
        if "mask" in samples[0]:
            keys.append("mask")
        out = {k: np.stack([smp[k] for smp in samples]) for k in keys}
        batches.append(out)
    return batches


def lr_schedule_fn(steps_per_epoch):
    from tripled_tpu.config import OptimConfig
    from tripled_tpu.train.optim import make_lr_schedule

    cfg = OptimConfig()
    sched = make_lr_schedule(cfg, steps_per_epoch)
    return lambda step: float(sched(step))


# ------------------------------------------------------------------ torch side

def to_torch_inputs(batch, frame_ids=(0, -1, 1)):
    import torch

    inputs = {}
    for i, fid in enumerate(frame_ids):
        inputs[("color", fid, 0)] = torch.from_numpy(
            np.transpose(batch["color"][:, i], (0, 3, 1, 2)).copy()
        )
        inputs[("color_aug", fid, 0)] = torch.from_numpy(
            np.transpose(batch["color_aug"][:, i], (0, 3, 1, 2)).copy()
        )
    K = torch.from_numpy(batch["K"].copy())
    inputs["K"] = K
    inputs["inv_K"] = torch.from_numpy(batch["inv_K"].copy())
    if "mask" in batch:
        # reference mask is image-shaped (3,H,W) (`kitti_dataset.py:169`)
        m = np.transpose(batch["mask"], (0, 3, 1, 2)).astype(np.float32)
        inputs[("mask", 0, 0)] = torch.from_numpy(np.repeat(m, 3, axis=1))
    for s in range(4):
        Ks = K.clone()
        Ks[:, :2] /= 2**s
        inputs[("K", s)] = Ks
        inputs[("inv_K", s)] = torch.inverse(Ks)
    return inputs


def eval_torch(model, val_ds, stereo_scale=False):
    import torch

    from tripled_tpu.eval.depth_metrics import (
        METRIC_NAMES,
        evaluate_depth_predictions,
    )

    model.eval()
    disps = []
    with torch.no_grad():
        for i in range(len(val_ds)):
            s = val_ds.sample(i, np.random.RandomState(i))
            img = torch.from_numpy(
                np.transpose(s["color"][0], (2, 0, 1)).copy()
            )[None]
            out = model(
                {("color_aug", 0, 0): img, ("color", 0, 0): img}
            )
            disps.append(out[("disp", 0, 0)][0, 0].numpy())
    model.train()
    errs, med, std = evaluate_depth_predictions(
        disps, [val_ds.gt_depths[i] for i in range(len(val_ds))],
        stereo_scale=stereo_scale,
    )
    return dict(zip(METRIC_NAMES, [float(x) for x in errs]))


def run_torch(batches, val_ds, height, width, layers, eval_every, lr_fn):
    import torch

    from tripled_tpu.utils.ref_loader import build_ref_model, default_opts

    opts = default_opts(
        "Baseline",
        height=height,
        width=width,
        imgs_per_gpu=batches[0]["color"].shape[0],
        depth_num_layers=layers,
        pose_num_layers=layers,
    )
    torch.manual_seed(0)
    model = build_ref_model(opts)
    model.train()
    optim = torch.optim.Adam(model.parameters(), lr=1e-4)

    history = []
    t0 = time.time()
    for step, batch in enumerate(batches):
        for g in optim.param_groups:
            g["lr"] = lr_fn(step)
        optim.zero_grad()
        _, losses = model(to_torch_inputs(batch))
        total = sum(
            v.mean() if isinstance(v, torch.Tensor) else sum(x.mean() for x in v)
            for v in losses.values()
        )
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 35.0)
        optim.step()
        if (step + 1) % eval_every == 0 or step == len(batches) - 1:
            m = eval_torch(model, val_ds)
            m["step"] = step + 1
            m["loss"] = float(total.detach())
            history.append(m)
            print(f"[torch {step + 1}] loss={m['loss']:.4f} "
                  f"abs_rel={m['abs_rel']:.4f} rmse={m['rmse']:.4f} "
                  f"a1={m['a1']:.4f} ({time.time() - t0:.0f}s)")
    return history


# ------------------------------------------------------- trajectory parity

def run_trajectory(batches, val_ds, height, width, layers, lr_fn,
                   steps_per_epoch=None, n_eval=10, variant="baseline"):
    """Same-init trajectory parity: export the torch model's INITIAL weights,
    import them into the jax model (`utils/torch_import.py`), train BOTH on
    the identical batch stream with dropout disabled, and compare (a) the
    loss at every step and (b) eval-mode disparity maps before/after.

    This is the discriminative parity evidence the degenerate synthetic
    Eigen metrics can't give (median scaling collapses near-flat predictions
    to GT-only values): with shared init + shared data, any op-level
    semantic mismatch (warp, SSIM, automask, BN, Adam, clip, schedule)
    shows up as loss-trajectory divergence within a few steps.
    """
    import jax
    import torch

    from tripled_tpu.config import ModelConfig, OptimConfig
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step
    from tripled_tpu.utils.compile_cache import enable_compilation_cache
    from tripled_tpu.utils.ref_loader import build_ref_model, default_opts
    from tripled_tpu.utils.torch_import import import_reference_checkpoint

    enable_compilation_cache()
    B = batches[0]["color"].shape[0]

    # ---- torch side, dropout off (deterministic trajectories; the only
    # remaining stochastic term is the reference's 1e-5 automask tie-break
    # noise, mono_baseline/net.py:166-170 — below float tolerance here)
    if variant == "flagship":
        # the paper config (cfg_kitti_tripleD.py:23-53) at study resolution:
        # disentangle + inpaint mask + auto_res + joint extractor + BN-heavy
        # ColorDecoder — every flagship-only loss term end-to-end
        ref_name = "mono_fm_joint_inpaint_disentangle"
        extra = dict(
            extractor_num_layers=layers,
            dis=1e-3, cvt=1e-3,
            auto_res_weight=5e-3,
            disentangle_layers=[False, False, False, False, True],
            skip_connection_multiplier=1,
            depth_skip_type=None,
            color_skip_type=None,
            color_skip_layers=[False, False, False, False],
            depth_use_shuffle=False,
            depth_disentangle_type="use_half",
            freeze_extractor=False,
        )
    else:
        ref_name = "Baseline"
        extra = {}
    opts = default_opts(
        ref_name, height=height, width=width, imgs_per_gpu=B,
        depth_num_layers=layers, pose_num_layers=layers, **extra,
    )
    torch.manual_seed(0)
    tmodel = build_ref_model(opts)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd0 = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}

    # ---- jax side from the SAME weights
    # pose_height/width stay at the default 192x640: the reference resizes
    # pose inputs to a hardcoded [192, 640] regardless of training res
    # (mono_baseline/net.py:111). Overriding them to the image res made the
    # step-0 loss differ by 1.7e-3; with the hardcode mirrored, loss matches
    # to ~3e-8 (see PARITY_TRAIN.json trajectory section).
    cfg_kw = dict(
        depth_num_layers=layers,
        pose_num_layers=layers,
        height=height,
        width=width,
        warp_align_corners=False,
        depth_dropout_rate=0.0,
    )
    if variant == "flagship":
        cfg_kw.update(
            name="mono_fm_joint_inpaint_disentangle",
            extractor_num_layers=layers,
            disentangle_layers=(False, False, False, False, True),
            depth_disentangle_type="use_half",
            auto_res_weight=5e-3,
            perception_weight=1e-3,
        )
    else:
        cfg_kw.update(name="mono_baseline")
    cfg = ModelConfig(**cfg_kw)
    model = build_model(cfg)
    # steps_per_epoch must match the schedule lr_fn was built from (the
    # torch side applies lr_fn directly); the caller passes the FULL batch
    # count even when only a prefix is replayed here (ADVICE r2).
    tx, _ = make_optimizer(
        OptimConfig(), steps_per_epoch=steps_per_epoch or len(batches)
    )
    state = create_train_state(model, tx, jax.device_put(batches[0]), seed=0)
    imported = import_reference_checkpoint(
        sd0, {"params": state.params, "batch_stats": state.batch_stats}
    )
    state = state.replace(
        params=jax.device_put(imported["params"]),
        batch_stats=jax.device_put(imported.get("batch_stats", {})),
        opt_state=tx.init(jax.device_put(imported["params"])),
    )
    step_fn = make_train_step(model, tx, donate=False)

    @jax.jit
    def predict(variables, imgs):
        return model.apply(
            variables, {"color_aug": imgs, "color": imgs}, train=False
        )[0]

    def disp_ours(state, i):
        s = val_ds.sample(i, np.random.RandomState(i))
        d = predict(
            {"params": state.params, "batch_stats": state.batch_stats},
            s["color"][None],
        )
        return np.asarray(d)[0, :, :, 0]

    def disp_torch(i):
        tmodel.eval()
        with torch.no_grad():
            s = val_ds.sample(i, np.random.RandomState(i))
            img = torch.from_numpy(
                np.transpose(s["color"][0], (2, 0, 1)).copy()
            )[None]
            out = tmodel({("color_aug", 0, 0): img, ("color", 0, 0): img})
            d = out[("disp", 0, 0)][0, 0].numpy()
        tmodel.train()
        return d

    def disp_delta(state):
        stats = []
        for i in range(min(n_eval, len(val_ds))):
            a, b = disp_ours(state, i), disp_torch(i)
            denom = max(float(np.abs(b).max()), 1e-9)
            if a.std() < 1e-12 or b.std() < 1e-12:
                # constant maps (training collapse on synthetic data):
                # corr is 0/0 — fall back to exact-agreement check
                corr = 1.0 if np.abs(a - b).max() == 0 else 0.0
            else:
                corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
            stats.append(
                {"max_abs": float(np.abs(a - b).max()),
                 "max_rel": float(np.abs(a - b).max() / denom),
                 "corr": corr}
            )
        return {
            "max_rel": max(s["max_rel"] for s in stats),
            "mean_max_rel": float(np.mean([s["max_rel"] for s in stats])),
            "min_corr": min(s["corr"] for s in stats),
        }

    init_delta = disp_delta(state)
    print("init disp delta:", init_delta)

    optim = torch.optim.Adam(tmodel.parameters(), lr=1e-4)
    rng = jax.random.PRNGKey(42)
    steps = []
    disp_deltas = {0: init_delta}
    for step, batch in enumerate(batches):
        # torch
        for g in optim.param_groups:
            g["lr"] = lr_fn(step)
        optim.zero_grad()
        _, tlosses = tmodel(to_torch_inputs(batch))
        ttotal = sum(
            v.mean() if isinstance(v, torch.Tensor) else sum(x.mean() for x in v)
            for v in tlosses.values()
        )
        ttotal.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 35.0)
        optim.step()
        # ours
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, jax.device_put(batch), r)
        lt, lo = float(ttotal.detach()), float(metrics["loss"])
        steps.append(
            {"step": step, "loss_torch": lt, "loss_ours": lo,
             "abs_diff": abs(lo - lt),
             "rel_diff": abs(lo - lt) / max(abs(lt), 1e-9)}
        )
        print(f"[traj {step}] torch={lt:.6f} ours={lo:.6f} "
              f"rel={steps[-1]['rel_diff']:.2e}")
        if step + 1 in (5, 10, 20) or step == len(batches) - 1:
            disp_deltas[step + 1] = disp_delta(state)
            print(f"disp delta @{step + 1}:", disp_deltas[step + 1])

    return {
        "what": "same-init same-data trajectory (%s R%d %dx%d bs%d, "
                "dropout off, warp_align_corners=False)"
                % (ref_name, layers, height, width, B),
        "disp_delta_at_step": disp_deltas,
        "steps": steps,
    }


# ------------------------------------------------------------------ jax side

def run_ours(batches, val_ds, height, width, layers, eval_every, lr_fn=None):
    import jax

    from tripled_tpu.config import ModelConfig, OptimConfig
    from tripled_tpu.eval.depth_metrics import (
        METRIC_NAMES,
        evaluate_depth_predictions,
    )
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig(
        name="mono_baseline",
        depth_num_layers=layers,
        pose_num_layers=layers,
        height=height,
        width=width,
        # pose res stays at the reference's hardcoded 192x640
        # (mono_baseline/net.py:111)
        # reference-on-modern-torch sampling (see ModelConfig docstring)
        warp_align_corners=False,
    )
    model = build_model(cfg)
    # same schedule semantics as the torch loop (make_lr_schedule is
    # golden-tested vs mmcv in tests/test_optim.py)
    tx, _ = make_optimizer(OptimConfig(), steps_per_epoch=len(batches))
    state = create_train_state(model, tx, jax.device_put(batches[0]), seed=0)
    step_fn = make_train_step(model, tx, donate=False)

    @jax.jit
    def predict(variables, imgs):
        return model.apply(
            variables, {"color_aug": imgs, "color": imgs}, train=False
        )[0]

    def eval_ours(state):
        disps = []
        for i in range(len(val_ds)):
            s = val_ds.sample(i, np.random.RandomState(i))
            d = predict(
                {"params": state.params, "batch_stats": state.batch_stats},
                s["color"][None],
            )
            disps.append(np.asarray(d)[0, :, :, 0])
        errs, med, std = evaluate_depth_predictions(
            disps, [val_ds.gt_depths[i] for i in range(len(val_ds))]
        )
        return dict(zip(METRIC_NAMES, [float(x) for x in errs]))

    rng = jax.random.PRNGKey(42)
    history = []
    t0 = time.time()
    for step, batch in enumerate(batches):
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, jax.device_put(batch), r)
        if (step + 1) % eval_every == 0 or step == len(batches) - 1:
            m = eval_ours(state)
            m["step"] = step + 1
            m["loss"] = float(metrics["loss"])
            history.append(m)
            print(f"[ours  {step + 1}] loss={m['loss']:.4f} "
                  f"abs_rel={m['abs_rel']:.4f} rmse={m['rmse']:.4f} "
                  f"a1={m['a1']:.4f} ({time.time() - t0:.0f}s)")
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_kitti")
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument(
        "--trajectory", type=int, default=0, metavar="K",
        help="also run the same-init trajectory comparison for K steps",
    )
    ap.add_argument(
        "--trajectory_variant", default="baseline",
        choices=("baseline", "flagship"),
        help="model for the trajectory study: Baseline or the TripleD "
        "flagship mono_fm_joint_inpaint_disentangle (VERDICT r2 item 4)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the jax side onto CPU (the axon terminal overrides the "
        "JAX_PLATFORMS env var, so this must be set in-process before any "
        "backend use; keeps the study off a busy TPU)",
    )
    ap.add_argument("--out", default="PARITY_TRAIN.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    flagship = args.trajectory_variant == "flagship"
    root = build_fixture(args.root, args.height, args.width, args.frames)
    train_ds, val_ds = make_datasets(
        root, args.height, args.width,
        name="kitti_inpaint" if flagship else "kitti",
        erase_count=16 if flagship else 0,
    )
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val")
    batches = gen_batches(train_ds, args.batch, args.steps)
    lr_fn = lr_schedule_fn(len(batches))

    result = {
        "config": vars(args),
        "protocol": "Eigen (crop/median-scale/clamp[1e-3,80]) on synthetic "
        "KITTI; identical pre-generated batch stream for both frameworks",
    }
    if args.trajectory:
        key = "trajectory_flagship" if flagship else "trajectory"
        result[key] = run_trajectory(
            batches[: args.trajectory], val_ds, args.height, args.width,
            args.layers, lr_fn, steps_per_epoch=len(batches),
            variant=args.trajectory_variant,
        )
    if not args.skip_ours:
        result["ours"] = run_ours(
            batches, val_ds, args.height, args.width, args.layers,
            args.eval_every, lr_fn,
        )
    if not args.skip_torch:
        result["reference_torch"] = run_torch(
            batches, val_ds, args.height, args.width, args.layers,
            args.eval_every, lr_fn,
        )
    if "ours" in result and "reference_torch" in result:
        ours_f = result["ours"][-1]
        ref_f = result["reference_torch"][-1]
        result["final_delta_pct"] = {
            k: round(100.0 * (ours_f[k] - ref_f[k]) / max(abs(ref_f[k]), 1e-9), 2)
            for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
        }
        print("final delta % (ours vs reference):", result["final_delta_pct"])

    # merge into an existing report so baseline + flagship sections coexist
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            prev.update(result)
            result = prev
        except Exception:
            pass
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
