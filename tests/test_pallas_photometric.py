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
    # Mosaic stages one batch item's full candidate slab for the
    # dynamically-offset Element row windows (measured 19.34 MB f32 at
    # 320x1024 vs the 16 MB chip VMEM): the flagship resolution fits only
    # with bf16 slabs, which net.py uses under bf16 compute
    assert not supports_shape(320, 1024, 4)
    assert supports_shape(320, 1024, 2)
    assert not supports_shape(96, 192)
    assert not supports_shape(192, 416)


def test_static_frame_tiebreak(rng_np):
    """PARITY.md "Pallas automask tie-break" re-validation (VERDICT r3
    item 4a): the kernel drops the reference's 1e-5 gaussian noise on
    identity losses (`mono/model/mono_fm/net.py:166-170`) and must resolve
    EXACT ties to the identity candidates — net.py lists identity
    candidates first and `_kernel` takes the lowest index on ties. Exact
    warped-vs-identity ties are the genuinely-static-frame case automask
    exists for: selecting identity automasks the pixel (no gradient to
    depth/pose), which is what the reference's noise produces in
    expectation half the time and what monodepth2 automasking intends."""
    B, H, W, C = 1, 16, 32, 3
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    src = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    # candidate order as in net.py: [identity..., warped...]; a static
    # frame makes the warped source EXACTLY equal the identity source
    preds = jnp.stack([src, src], axis=1)  # k=0 identity, k=1 warped
    out, idx = fused_min_reprojection(target, preds, 8, True)
    assert (np.asarray(idx) == 0).all()  # every exact tie -> identity

    # gradient consequence: the automasked (identity-selected) pixels send
    # NO gradient to the warped candidate — depth/pose receive nothing
    def warped_loss(p_warped):
        out, _ = fused_min_reprojection(
            target, jnp.stack([src, p_warped], 1), 8, True
        )
        return out.sum()

    g = jax.grad(warped_loss)(src)
    np.testing.assert_array_equal(np.asarray(g), 0.0)

    # the XLA noisy path on the same static tie selects identity ~half the
    # pixels per draw (noise is zero-mean); the MIN VALUE is identical to
    # the kernel's either way — the deviation is gradient routing only
    from tripled_tpu.ops.losses import (
        min_reprojection_with_automask,
        reprojection_loss,
    )

    pl_ident = [reprojection_loss(src, target)]
    pl_warp = [reprojection_loss(src, target)]
    noisy = min_reprojection_with_automask(
        pl_warp, pl_ident, jax.random.PRNGKey(0)
    )
    # bound = the injected noise itself (zero-mean 1e-5 gaussian)
    np.testing.assert_allclose(
        np.asarray(noisy)[..., 0], np.asarray(out), rtol=1e-5, atol=1e-4
    )


def test_static_scene_automask_agreement(rng_np):
    """On a true static scene (source == target, warp blurs), identity
    strictly beats warped: the fused kernel and the noisy XLA path agree
    on automask selection at every pixel (no ties involved)."""
    B, H, W, C = 1, 16, 32, 3
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    # static scene: identity == target (loss ~ 0); warped = blurred target
    blurred = (
        target
        + jnp.roll(target, 1, axis=2)
        + jnp.roll(target, -1, axis=2)
    ) / 3.0
    preds = jnp.stack([target, blurred], axis=1)
    out, idx = fused_min_reprojection(target, preds, 8, True)
    assert (np.asarray(idx) == 0).all()

    from tripled_tpu.ops.losses import (
        min_reprojection_with_automask,
        reprojection_loss,
    )

    noisy = min_reprojection_with_automask(
        [reprojection_loss(blurred, target)],
        [reprojection_loss(target, target)],
        jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        np.asarray(noisy)[..., 0], np.asarray(out), rtol=1e-5, atol=1e-4
    )


def test_grad_pruning_matches_full(rng_np):
    """grad_ks + need_target_grad=False (the net.py configuration: identity
    candidates and the target are raw input frames whose cotangents are
    discarded) must reproduce the full backward exactly on the kept
    candidates and return zeros elsewhere."""
    B, K, H, W, C = 1, 4, 16, 32, 3
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng_np.rand(B, K, H, W, C), jnp.float32)

    def loss(t, p, grad_ks, need_t):
        out, _ = fused_min_reprojection(t, p, 8, True, grad_ks, need_t)
        return (out * jnp.cos(out)).sum()  # non-trivial cotangent

    gt_full, gp_full = jax.grad(loss, argnums=(0, 1))(
        target, preds, None, True
    )
    gt_p, gp_p = jax.grad(loss, argnums=(0, 1))(
        target, preds, (2, 3), False
    )
    np.testing.assert_allclose(
        np.asarray(gp_p[:, 2:]), np.asarray(gp_full[:, 2:]), rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_array_equal(np.asarray(gp_p[:, :2]), 0.0)
    np.testing.assert_array_equal(np.asarray(gt_p), 0.0)
    # and the kept-candidate gradients are not trivially zero
    assert np.abs(np.asarray(gp_full[:, 2:])).max() > 0


def test_bf16_slabs_match_f32(rng_np):
    """bf16 candidate slabs (the flagship 320x1024 configuration: inputs,
    g, and idx all ship as bf16; the kernel upcasts per tile) must agree
    with the f32 path to bf16 input precision, forward and backward."""
    B, K, H, W, C = 1, 4, 24, 32, 3
    target = jnp.asarray(rng_np.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng_np.rand(B, K, H, W, C), jnp.float32)
    t16 = target.astype(jnp.bfloat16)
    p16 = preds.astype(jnp.bfloat16)

    out32, _ = fused_min_reprojection(target, preds, 8, True)
    out16, _ = fused_min_reprojection(t16, p16, 8, True)
    assert out16.dtype == jnp.float32  # loss map stays f32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=2e-2
    )

    # backward: share ONE argmin (bf16-quantized inputs flip near-tie
    # argmins, which re-routes those pixels' gradients — input effect, not
    # kernel error), and feed the f32 reference the SAME bf16 texels
    from tripled_tpu.ops.pallas.photometric import (
        _backward_tiled,
        _bwd_autodiff,
    )

    g = (out16 * jnp.cos(out16) + 1.0).astype(jnp.float32)
    _, idx = fused_min_reprojection(t16, p16, 8, True)
    gp16 = _backward_tiled(t16, p16, g, idx, True, (2, 3), False)[1]
    gp32 = _bwd_autodiff(
        t16.astype(jnp.float32), p16.astype(jnp.float32), idx, g
    )[1]
    assert gp16.dtype == jnp.bfloat16
    # 6e-3: the r5 bf16 gradient tiles round inside the kernel and the
    # reflect-pad fold then adds in bf16 (one extra rounding vs the old
    # f32-accumulate-then-cast) — worst case one rounding step past the
    # old 5e-3 envelope
    np.testing.assert_allclose(
        np.asarray(gp16[:, 2:], np.float32),
        np.asarray(gp32[:, 2:]),
        atol=6e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(gp16[:, :2], np.float32), 0.0
    )
