"""On-TPU A/B of the Pallas deterministic-identity tie-break vs the XLA
noisy tie-break (VERDICT r3 item 4a; PARITY.md "Pallas automask tie-break").

The reference adds 1e-5 gaussian noise to identity-reprojection losses
before the automask min (`mono/model/mono_fm/net.py:166-170`); the fused
Pallas kernel instead resolves exact ties deterministically to the identity
candidates (listed first). Exact warped-vs-identity ties are the
genuinely-static-frame case automask exists for, so this measures:

1. op-level automask SELECTION agreement on-chip, on three candidate
   regimes built from rendered frames: exact ties (static frame, warp is
   identity), near-ties (static frame, sub-pixel warp), and moving frames;
2. a multi-hundred-step mono_fm training trajectory on a dataset that
   MIXES static and moving samples, Pallas kernel vs XLA noisy path (same
   init, same data), comparing per-step loss and final disparity maps.

Writes the `pallas_tiebreak` section of PARITY_TRAIN.json.

Usage: python dev/tiebreak_ab.py [steps=300]
Needs a TPU (the kernel is TPU-only); CPU runs are refused.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tripled_tpu.config import ModelConfig, OptimConfig  # noqa: E402
from tripled_tpu.models import build_model, canonicalize  # noqa: E402
from tripled_tpu.ops.losses import (  # noqa: E402
    min_reprojection_with_automask,
    reprojection_loss,
)
from tripled_tpu.ops.pallas.photometric import (  # noqa: E402
    fused_min_reprojection,
    supports_shape,
)
from tripled_tpu.ops.warp import grid_sample  # noqa: E402
from tripled_tpu.train.optim import make_optimizer  # noqa: E402
from tripled_tpu.train.state import create_train_state  # noqa: E402
from tripled_tpu.train.step import make_train_step  # noqa: E402
from tripled_tpu.utils.inputs import dummy_train_inputs  # noqa: E402

H, W = 96, 384  # W % 128 == 0 so the kernel path engages


def _render(b, seed):
    """KITTI-ish smooth frames (gradients + blobs), (B, H, W, 3)."""
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(
        np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij"
    )
    imgs = []
    for _ in range(b):
        img = np.stack(
            [0.3 + 0.4 * xs, 0.2 + 0.5 * ys, 0.5 + 0.3 * xs * ys], -1
        )
        for _ in range(6):
            cy, cx, r = rng.rand(3)
            blob = np.exp(
                -(((ys - cy) ** 2 + (xs - cx) ** 2) / (0.02 + 0.05 * r))
            )
            img += 0.25 * (rng.rand(3) - 0.5) * blob[..., None]
        imgs.append(np.clip(img, 0, 1))
    return np.asarray(imgs, np.float32)


def _shift_coords(b, dx, dy):
    ys, xs = np.meshgrid(
        np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32),
        indexing="ij",
    )
    c = np.stack([xs + dx, ys + dy], -1)[None]
    return np.broadcast_to(c, (b, H, W, 2)).astype(np.float32)


def selection_agreement(n_draws=8):
    """Per-pixel automask selection: Pallas kernel vs XLA noisy path."""
    b = 4
    target = jnp.asarray(_render(b, 0))
    src = jnp.asarray(_render(b, 1))

    def selections(identity_img, warped_img, seed):
        # candidate order as net.py: [identity, warped]
        preds = jnp.stack([identity_img, warped_img], 1)
        _, idx_pallas = fused_min_reprojection(target, preds)
        li = reprojection_loss(identity_img, target)
        lw = reprojection_loss(warped_img, target)
        idx_noisy = []
        for d in range(n_draws):
            noise = (
                jax.random.normal(jax.random.PRNGKey(seed + d), li.shape)
                * 1e-5
            )
            idx_noisy.append(
                jnp.argmin(jnp.concatenate([li + noise, lw], -1), -1)
            )
        return np.asarray(idx_pallas), [np.asarray(i) for i in idx_noisy]

    out = {}
    # regime 1: exact tie — static frame, warp is exactly identity
    idx_p, idx_n = selections(src, src, 100)
    out["exact_tie"] = {
        "pallas_identity_frac": float((idx_p == 0).mean()),
        "noisy_identity_frac_mean": float(
            np.mean([(i == 0).mean() for i in idx_n])
        ),
        "note": "ties: kernel -> identity always (automasks the pixel); "
        "noise -> ~half per draw; min VALUE identical either way",
    }
    # regime 2: static frame, sub-pixel warp (realistic near-tie: the warp
    # blurs, identity strictly wins almost everywhere)
    warped = grid_sample(src, jnp.asarray(_shift_coords(b, 0.3, 0.15)))
    idx_p, idx_n = selections(src, warped, 200)
    agree = np.mean([(idx_p == i).mean() for i in idx_n])
    out["static_subpixel_warp"] = {
        "pallas_identity_frac": float((idx_p == 0).mean()),
        "noisy_identity_frac_mean": float(
            np.mean([(i == 0).mean() for i in idx_n])
        ),
        "selection_agreement": float(agree),
    }
    # regime 3: moving scene (warped source differs by pixels; no ties)
    moved = grid_sample(src, jnp.asarray(_shift_coords(b, 4.0, 0.5)))
    idx_p, idx_n = selections(moved, src, 300)
    agree = np.mean([(idx_p == i).mean() for i in idx_n])
    out["moving"] = {
        "pallas_identity_frac": float((idx_p == 0).mean()),
        "noisy_identity_frac_mean": float(
            np.mean([(i == 0).mean() for i in idx_n])
        ),
        "selection_agreement": float(agree),
    }
    return out


def make_batches(cfg, n, batch=4, static_frac=0.5):
    """Training batches where `static_frac` of samples have ALL frames
    identical (genuinely static scenes — the automask target case)."""
    batches = []
    for i in range(n):
        inp = dummy_train_inputs(cfg, batch, seed=500 + i)
        f = len(cfg.frame_ids)
        colors = []
        for s in range(batch):
            base = _render(1, 1000 + i * batch + s)[0]
            if s < batch * static_frac:
                frames = np.repeat(base[None], f, 0)
            else:
                frames = np.stack(
                    [
                        np.roll(base, shift=3 * k, axis=1)
                        for k in range(f)
                    ]
                )
            colors.append(frames)
        colors = np.asarray(colors, np.float32)
        inp["color"] = colors
        inp["color_aug"] = colors.copy()
        batches.append(inp)
    return batches


def disp_compare(a, b):
    """Final-disparity agreement stats that stay meaningful when the maps
    are near-constant (corrcoef is NaN at zero variance)."""
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    out = {
        "rel_rmse": float(
            np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(a**2)), 1e-12)
        ),
        "max_rel_diff": float(np.max(np.abs(a - b)) / max(np.abs(a).max(), 1e-12)),
        "mean_a": float(a.mean()),
        "std_a": float(a.std()),
        "std_b": float(b.std()),
    }
    if a.std() > 0 and b.std() > 0:
        out["corr"] = float(np.corrcoef(a, b)[0, 1])
    else:
        out["corr"] = None
        out["note"] = "near-constant disp; corr undefined, use rel_rmse"
    return out


def trajectory(steps):
    base = canonicalize(
        ModelConfig(
            name="mono_fm",
            depth_num_layers=18,
            pose_num_layers=18,
            extractor_num_layers=18,
            height=H,
            width=W,
            pose_height=H,
            pose_width=W,
            perception_weight=1e-3,
            depth_dropout_rate=0.0,
        )
    )
    assert supports_shape(H, W)
    n_unique = 24
    batches = make_batches(base, n_unique)
    eval_batch = dummy_train_inputs(base, 4, seed=9999)

    def run(use_pallas):
        cfg = dataclasses.replace(base, use_pallas_photometric=use_pallas)
        model = build_model(cfg)
        tx, _ = make_optimizer(
            OptimConfig(warmup_iters=10), steps_per_epoch=n_unique
        )
        state = create_train_state(model, tx, batches[0], seed=7)
        step = make_train_step(model, tx, donate=False)
        losses = []
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(
                state, batches[i % n_unique], jax.random.PRNGKey(i)
            )
            losses.append(float(m["loss"]))
        dt = time.perf_counter() - t0
        # TRAIN-mode disparities (BN batch statistics, mutation
        # discarded): the short-horizon study leaves BN's running eval
        # stats near init, which saturates the sigmoid head to exact 0/1
        # and voids the comparison (see speed_bundle_ab.predict). disps
        # depend only on the target frame; both arms use the same rngs.
        (outputs, _), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            eval_batch,
            train=True,
            rngs={
                "dropout": jax.random.PRNGKey(0),
                "automask": jax.random.PRNGKey(1),
                "crop": jax.random.PRNGKey(2),
                "rotation": jax.random.PRNGKey(3),
            },
            mutable=["batch_stats"],
        )
        disp = outputs["disps"][0]
        return losses, np.asarray(disp), dt

    l_pallas, d_pallas, t_p = run(True)
    l_noisy, d_noisy, t_n = run(False)
    rel = [
        abs(a - b) / max(abs(a), 1e-12) for a, b in zip(l_pallas, l_noisy)
    ]
    return {
        "steps": steps,
        "static_sample_frac": 0.5,
        "loss_pallas_first5": l_pallas[:5],
        "loss_noisy_first5": l_noisy[:5],
        "loss_pallas_last5": l_pallas[-5:],
        "loss_noisy_last5": l_noisy[-5:],
        "max_rel_loss_diff": max(rel),
        "mean_rel_loss_diff": float(np.mean(rel)),
        "final_rel_loss_diff": rel[-1],
        "final_disp": disp_compare(d_pallas, d_noisy),
        "sec_pallas": round(t_p, 1),
        "sec_noisy": round(t_n, 1),
    }


def endpoint(steps):
    """Tie-break endpoint on the NON-degenerate parallax fixture (VERDICT
    r4 item 4): same-init 300-step runs, Pallas deterministic tie-break vs
    XLA noisy tie-break, on parallax data (depth-dependent motion, so the
    final disparity is non-constant and Eigen metrics discriminate) with
    25% genuinely-static samples mixed in to keep exact ties exercised."""
    sys.path.insert(0, "/root/repo/dev")
    from speed_bundle_ab import run as bundle_run

    from tripled_tpu.cli.parity_compare import (
        build_fixture,
        gen_batches,
        make_datasets,
    )

    h, w = 96, 384  # W % 128 == 0 -> kernel path engages
    root = build_fixture(
        "/tmp/tiebreak_kitti_px", h, w, num_frames=40, scene="parallax"
    )
    train_ds, val_ds = make_datasets(root, h, w)
    n_unique = 24
    batch = 4
    batches = gen_batches(train_ds, batch, n_unique, seed=7)
    for b in batches:
        # first sample of each batch: all frames = the target frame
        b["color"][:1] = b["color"][:1, :1]
        b["color_aug"][:1] = b["color_aug"][:1, :1]

    lp, ep, dp, tp = bundle_run(
        "exact", batches, val_ds, steps, n_unique,
        overrides={"use_pallas_photometric": True},
        h=h, w=w, layers=(18, 18, 18),
    )
    ln, en, dn, tn = bundle_run(
        "exact", batches, val_ds, steps, n_unique,
        overrides={"use_pallas_photometric": False},
        h=h, w=w, layers=(18, 18, 18),
    )
    rel = [abs(a - b) / max(abs(a), 1e-12) for a, b in zip(lp, ln)]
    return {
        "fixture": "parallax (non-degenerate; 25% static samples)",
        "steps": steps,
        "loss_pallas_last5": lp[-5:],
        "loss_noisy_last5": ln[-5:],
        "mean_rel_loss_diff": float(np.mean(rel)),
        "max_rel_loss_diff": float(np.max(rel)),
        "final_rel_loss_diff": rel[-1],
        "eigen_pallas": ep,
        "eigen_noisy": en,
        "eigen_rel_delta": {
            k: abs(ep[k] - en[k]) / max(abs(en[k]), 1e-12) for k in ep
        },
        "final_disp": disp_compare(dp, dn),
        "sec_pallas": round(tp, 1),
        "sec_noisy": round(tn, 1),
    }


def main():
    assert jax.devices()[0].platform == "tpu", "needs the TPU"
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    out = {
        "what": (
            "Pallas deterministic-identity tie-break vs XLA noisy "
            "tie-break (reference mono_fm/net.py:166-170): op-level "
            "automask selection agreement on-chip + mono_fm R18 96x384 "
            "bs4 trajectory on 50% genuinely-static samples + endpoint "
            "study on the non-degenerate parallax fixture"
        ),
        "selection": selection_agreement(),
        "trajectory": trajectory(steps),
        "endpoint_parallax": endpoint(steps),
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/PARITY_TRAIN.json") as f:
        doc = json.load(f)
    doc["pallas_tiebreak"] = out
    with open("/root/repo/PARITY_TRAIN.json", "w") as f:
        json.dump(doc, f, indent=1)
    print("merged into PARITY_TRAIN.json: pallas_tiebreak")


if __name__ == "__main__":
    main()
