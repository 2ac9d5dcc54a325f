"""Fused photometric min-reprojection Pallas kernel.

The per-scale hot loop of every model variant evaluates, for K candidate
images (warped sources + automask identity sources) against the target:

    loss_k = 0.85 * mean_c(SSIM_3x3(pred_k, target)) +
             0.15 * mean_c(robust_l1(pred_k, target))
    out    = min_k loss_k          (+ argmin for masking / analysis)

(`mono/model/mono_fm_joint/net.py:67-71,109-128`). The XLA path materializes
K SSIM pipelines (5 box filters each) and K HBM loss maps. This kernel fuses
the entire comparison for all K candidates into one VMEM pass over row tiles:
each (batch, row-tile) grid step reads the reflection-padded target and the K
padded candidates once, computes the five 3×3 box sums as shifted-slice
accumulations in registers/VMEM, and writes only the (H, W) min map and an
int32 argmin.

Layout notes (TPU): planar channel layout (C, rows, W+2) so x-shifts are
plain lane slices; the y halo comes from overlapping row-window DMAs of the
pre-padded input (inputs stay in HBM via memory_space=ANY). Min/argmin stay
in VMEM.

Backward: custom VJP. d(min_k loss_k) flows only through the argmin
candidate, so the backward pass masks each candidate's cotangent with
(argmin == k) and reuses the (XLA-differentiated) per-candidate loss — no
K-way forward re-materialization.

Measured on a v5e chip (bs12 @192×640, K=4, f32): forward 2.19 ms vs 2.87 ms
for the XLA path (1.31×). End-to-end in the mono_fm train step the XLA path
currently wins (1710 vs 1470 imgs/s) because the custom-VJP backward
recomputes per-candidate SSIM chains and the planar-layout transposes add
HBM traffic — so `ModelConfig.use_pallas_photometric` defaults to False; a
hand-written backward kernel is the next step to flip the sign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tripled_tpu.ops.losses import reprojection_loss

_C1 = 0.01**2
_C2 = 0.03**2


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(tgt_ref, preds_ref, out_ref, idx_ref, *, K, TH, W, C):
    """Grid step: one (batch, row-tile).

    tgt_ref:   (C, TH+2, W+2) padded target rows (planar channels)
    preds_ref: (K, C, TH+2, W+2) padded candidates
    out_ref:   (TH, W) min loss; idx_ref: (TH, W) int32 argmin
    """

    def channel_loss(x, y):
        # x, y: (TH+2, W+2) single-channel padded tiles
        sx = jnp.zeros((TH, W), jnp.float32)
        sy = jnp.zeros((TH, W), jnp.float32)
        sxx = jnp.zeros((TH, W), jnp.float32)
        syy = jnp.zeros((TH, W), jnp.float32)
        sxy = jnp.zeros((TH, W), jnp.float32)
        for di in range(3):
            for dj in range(3):
                xs = x[di : di + TH, dj : dj + W]
                ys = y[di : di + TH, dj : dj + W]
                sx += xs
                sy += ys
                sxx += xs * xs
                syy += ys * ys
                sxy += xs * ys
        mu_x = sx / 9.0
        mu_y = sy / 9.0
        sigma_x = sxx / 9.0 - mu_x * mu_x
        sigma_y = syy / 9.0 - mu_y * mu_y
        sigma_xy = sxy / 9.0 - mu_x * mu_y
        n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
        d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
        ssim = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)
        cx = x[1 : 1 + TH, 1 : 1 + W]
        cy = y[1 : 1 + TH, 1 : 1 + W]
        l1 = jnp.sqrt((cy - cx) ** 2 + 1e-6)
        return 0.85 * ssim + 0.15 * l1

    best = jnp.full((TH, W), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((TH, W), jnp.int32)
    for k in range(K):
        acc = jnp.zeros((TH, W), jnp.float32)
        for c in range(C):
            acc += channel_loss(
                preds_ref[k, c].astype(jnp.float32),
                tgt_ref[c].astype(jnp.float32),
            )
        loss_k = acc / C
        take = loss_k < best
        best = jnp.where(take, loss_k, best)
        best_idx = jnp.where(take, k, best_idx)
    out_ref[:] = best
    idx_ref[:] = best_idx


def _pad_hw(x):
    """Reflect-pad H and W by 1 (NHWC)."""
    return jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")


def _forward_overlap(target, preds, row_tile, interpret):
    """Row-tiled forward. BlockSpec index maps address non-overlapping
    blocks, but SSIM tiles need a 1-row halo; so the padded inputs stay in
    HBM (memory_space=ANY) and each grid step DMAs its overlapping
    (TH+2)-row window into VMEM scratch explicitly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, H, W, C = preds.shape
    # Pick a row tile: a multiple of 8 dividing H (aligned DMA offsets);
    # otherwise fall back to a single tile (offset 0 is trivially aligned).
    cand = [t for t in range(min(row_tile, H), 7, -1)
            if H % t == 0 and t % 8 == 0]
    TH = cand[0] if cand else H
    n_tiles = H // TH
    WIN = -((TH + 2) // -8) * 8  # DMA window rows, rounded up to 8 sublanes
    # total rows so the last window [H-TH, H-TH+WIN) stays in bounds
    total_rows = H - TH + WIN
    extra_rows = total_rows - (H + 2)
    # lane dim of the DMA'd slabs must be 128-aligned
    WP = -((W + 2) // -128) * 128
    extra_cols = WP - (W + 2)

    # planar channel layout: (B, C, total_rows, WP). Mosaic requires DMA
    # window shapes aligned to the (8, 128) tile, so windows are WIN rows by
    # the full padded width; the kernel reads the first TH+2 rows / W+2 cols.
    def _to_planes(x):
        return jnp.pad(x, [(0, 0), (0, extra_rows), (0, extra_cols), (0, 0)])

    tgt_p = _to_planes(_pad_hw(target)).transpose(0, 3, 1, 2)
    preds_p = _to_planes(
        _pad_hw(preds.reshape(B * K, H, W, C))
    ).reshape(B, K, total_rows, WP, C).transpose(0, 1, 4, 2, 3)

    def kernel(tgt_hbm, preds_hbm, out_ref, idx_ref, tgt_vmem, preds_vmem, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * TH
        if TH % 8 == 0:
            row0 = pl.multiple_of(row0, 8)
        cp1 = pltpu.make_async_copy(
            tgt_hbm.at[b, :, pl.ds(row0, WIN), :], tgt_vmem, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            preds_hbm.at[b, :, :, pl.ds(row0, WIN), :], preds_vmem, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        _kernel(
            tgt_vmem,
            preds_vmem,
            out_ref.at[0],
            idx_ref.at[0],
            K=K,
            TH=TH,
            W=W,
            C=C,
        )

    out, idx = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # ANY-space inputs must be whole-array blocks with a trivial
            # index map; the kernel slices its (batch, row-window) via DMA.
            pl.BlockSpec((B, C, total_rows, WP), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.HBM),
            pl.BlockSpec(
                (B, K, C, total_rows, WP), lambda b, t: (0, 0, 0, 0, 0),
                memory_space=pltpu.HBM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, WIN, WP), jnp.float32),
            pltpu.VMEM((K, C, WIN, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tgt_p.astype(jnp.float32), preds_p.astype(jnp.float32))
    return out, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_min_reprojection(
    target: jnp.ndarray,
    preds: jnp.ndarray,
    row_tile: int = 16,
    interpret: bool = False,
):
    """min_k reprojection_loss(preds[:, k], target).

    Args:
      target: (B, H, W, C); preds: (B, K, H, W, C).
    Returns:
      (min_loss (B, H, W), argmin (B, H, W) int32).
    """
    return _forward_overlap(target, preds, row_tile, interpret)


def _fwd(target, preds, row_tile, interpret):
    out, idx = _forward_overlap(target, preds, row_tile, interpret)
    return (out, idx), (target, preds, idx)


def _bwd(row_tile, interpret, res, cts):
    target, preds, idx = res
    g, _ = cts  # (B, H, W); argmin is non-differentiable
    B, K, H, W, C = preds.shape

    def selected_loss(target, preds):
        total = 0.0
        for k in range(K):
            lk = reprojection_loss(preds[:, k], target)[..., 0]  # (B,H,W)
            total = total + jnp.sum(lk * (idx == k) * g)
        return total

    dt, dp = jax.grad(selected_loss, argnums=(0, 1))(target, preds)
    return dt, dp


fused_min_reprojection.defvjp(_fwd, _bwd)
