"""Fused Pallas min-reprojection vs the jnp reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tripled_tpu.ops.losses import reprojection_loss
from tripled_tpu.ops.pallas.photometric import fused_min_reprojection


def _reference(target, preds):
    losses = [reprojection_loss(preds[:, k], target) for k in range(preds.shape[1])]
    stacked = jnp.concatenate(losses, axis=-1)  # (B,H,W,K)
    return jnp.min(stacked, -1), jnp.argmin(stacked, -1)


@pytest.mark.parametrize("shape", [(2, 3, 16, 32, 3), (1, 4, 24, 40, 3)])
def test_fused_matches_reference(shape, rng_np):
    B, K, H, W, C = shape
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng_np.rand(B, K, H, W, C), jnp.float32)
    out, idx = fused_min_reprojection(target, preds, 8, True)
    ref_out, ref_idx = _reference(target, preds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5,
                               atol=1e-6)
    # argmin may differ on exact ties; check values agree at chosen indices
    chosen = np.take_along_axis(
        np.stack(
            [np.asarray(reprojection_loss(preds[:, k], target))[..., 0]
             for k in range(K)], -1
        ),
        np.asarray(idx)[..., None],
        -1,
    )[..., 0]
    np.testing.assert_allclose(chosen, np.asarray(ref_out), rtol=1e-5, atol=1e-6)


def test_fused_gradients_match(rng_np):
    B, K, H, W, C = 1, 2, 12, 16, 3
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng_np.rand(B, K, H, W, C), jnp.float32)

    def loss_fused(t, p):
        out, _ = fused_min_reprojection(t, p, 6, True)
        return out.mean()

    def loss_ref(t, p):
        out, _ = _reference(t, p)
        return out.mean()

    gt_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(target, preds)
    gt_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(target, preds)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r), rtol=1e-4,
                               atol=1e-6)


def test_supports_shape_gate():
    # Mosaic lane-slice alignment: only 128-multiple widths compile on TPU
    # (a W=192 config hit 'Slice shape along dimension 2 must be aligned to
    # tiling (128)'); net.py falls back to the XLA path otherwise.
    from tripled_tpu.ops.pallas.photometric import supports_shape

    assert supports_shape(192, 640)
    # 320x1024 exceeds the 16 MB scoped-VMEM limit (the compiler stages an
    # 18.1 MB per-batch-item candidate slab per grid step; observed on
    # device round 3) — must fall back to the XLA path
    assert not supports_shape(320, 1024)
    assert not supports_shape(96, 192)
    assert not supports_shape(192, 416)
