"""Photometric / smoothness loss primitives.

Functional equivalents of the loss math in
`mono/model/mono_fm_joint/net.py:59-71,109-128,279-330` — Charbonnier robust
L1, the 0.85·SSIM + 0.15·L1 reprojection loss, per-pixel min over source
frames with automask identity terms, and the 1st+2nd-order edge-aware
smoothness / feature-regularization losses.

All image tensors are NHWC; per-pixel losses are (B, H, W, 1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tripled_tpu.ops.image import resize_area
from tripled_tpu.ops.ssim import ssim


def robust_l1(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Charbonnier |pred - target| (`net.py:59-61`)."""
    return jnp.sqrt((target - pred) ** 2 + eps * eps)


def perceptional_loss(tgt_f: jnp.ndarray, src_f: jnp.ndarray) -> jnp.ndarray:
    """Channel-mean robust L1 between feature maps (`net.py:63-65`).

    The channel-mean always reduces (and returns) in f32; when both inputs
    are bf16 (compute_dtype='bfloat16' feature path) the elementwise
    Charbonnier stays bf16 so its fwd/bwd tensors ship at half the HBM
    bytes (r5 flagship byte ledger: the f32 feature-loss backward was
    15.4 GB/step at 320x1024). f32 inputs are unchanged (exact path)."""
    return jnp.mean(
        robust_l1(tgt_f, src_f).astype(jnp.float32), axis=-1, keepdims=True
    )


def reprojection_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.85·SSIM + 0.15·robust-L1, channel-mean (`net.py:67-71`)."""
    photo = jnp.mean(robust_l1(pred, target), axis=-1, keepdims=True)
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * photo


def min_reprojection_with_automask(
    pred_losses: Sequence[jnp.ndarray],
    identity_losses: Sequence[jnp.ndarray],
    rng: jax.Array | None,
    noise_scale: float = 1e-5,
) -> jnp.ndarray:
    """Per-pixel min over per-source reprojection losses with automasking.

    Identity losses (reprojection of the *unwarped* source against the
    target) are perturbed with tiny gaussian noise as a tie-break and
    concatenated before the min (`net.py:109-128`). Returns (B, H, W, 1).
    """
    parts = []
    if identity_losses:
        ident = jnp.concatenate(list(identity_losses), axis=-1)
        if rng is not None:
            ident = ident + jax.random.normal(rng, ident.shape, ident.dtype) * noise_scale
        parts.append(ident)
    parts.append(jnp.concatenate(list(pred_losses), axis=-1))
    stacked = jnp.concatenate(parts, axis=-1)
    return jnp.min(stacked, axis=-1, keepdims=True)


def _grad_x(d: jnp.ndarray) -> jnp.ndarray:
    return d[:, :, 1:, :] - d[:, :, :-1, :]


def _grad_y(d: jnp.ndarray) -> jnp.ndarray:
    return d[:, 1:, :, :] - d[:, :-1, :, :]


def _edge_weighted(term: jnp.ndarray, img_grad: jnp.ndarray, a: float) -> jnp.ndarray:
    if term.size == 0:
        # degenerate map (< 3 px along the differenced axis): the gradient
        # is empty and jnp.mean would yield nan; the term contributes 0
        return jnp.zeros((), term.dtype)
    w = jnp.exp(-a * jnp.mean(jnp.abs(img_grad), axis=-1, keepdims=True))
    # reduce in f32 regardless of the term dtype (bf16 feature-loss path
    # keeps the elementwise tensors bf16, the accumulation exact)
    return jnp.mean((jnp.abs(term) * w).astype(jnp.float32))


def _second_order_terms(d: jnp.ndarray, img: jnp.ndarray, a: float) -> jnp.ndarray:
    dx, dy = _grad_x(d), _grad_y(d)
    ix, iy = _grad_x(img), _grad_y(img)
    s2 = (
        _edge_weighted(_grad_x(dx), _grad_x(ix), a)
        + _edge_weighted(_grad_y(dx), _grad_y(ix), a)
        + _edge_weighted(_grad_x(dy), _grad_x(iy), a)
        + _edge_weighted(_grad_y(dy), _grad_y(iy), a)
    )
    return s2


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray, a1: float = 0.5, a2: float = 0.5) -> jnp.ndarray:
    """1st + 2nd order edge-aware disparity smoothness (`net.py:279-302`).

    `img` is area-resized to disp resolution, matching F.interpolate('area').
    """
    b, h, w, _ = disp.shape
    img = resize_area(img, h, w)
    dx, dy = _grad_x(disp), _grad_y(disp)
    ix, iy = _grad_x(img), _grad_y(img)
    smooth1 = _edge_weighted(dx, ix, a1) + _edge_weighted(dy, iy, a1)
    smooth2 = _second_order_terms(disp, img, a2)
    return smooth1 + smooth2


def feature_regularization_loss(
    feature: jnp.ndarray, img: jnp.ndarray, dis: float, cvt: float
) -> jnp.ndarray:
    """-dis·smooth1 + cvt·smooth2 on encoder features (`net.py:309-330`).

    discriminative (1st-order, maximized) + convergent (2nd-order, minimized)
    gradient loss; edge weights use a=1.

    Runs elementwise in the FEATURE dtype (the resized image is cast to
    match): under compute_dtype='bfloat16' the caller passes bf16 features
    so the full-feature-map gradient tensors of the fwd/bwd stay bf16 —
    the f32 version was the flagship's largest loss-side HBM writer (r5
    byte ledger, 4x ~1 GB f32 diff tensors at 320x1024). All reductions
    stay f32 (`_edge_weighted`). f32 features are bit-identical to before.
    """
    b, h, w, _ = feature.shape
    img = resize_area(img, h, w).astype(feature.dtype)
    fx, fy = _grad_x(feature), _grad_y(feature)
    ix, iy = _grad_x(img), _grad_y(img)
    smooth1 = _edge_weighted(fx, ix, 1.0) + _edge_weighted(fy, iy, 1.0)
    smooth2 = _second_order_terms(feature, img, 1.0)
    return -dis * smooth1 + cvt * smooth2
