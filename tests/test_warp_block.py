"""grid_sample_block (output-block gather) vs the exact bilinear warp.

The block path is exact wherever a bh x bw output block's samples land
within (patch_side - 1) px of the block's floor(min) anchor — 3 px for
(2,2), 5 px in x for (2,4); violating samples clamp to the patch edge.
These tests pin, for block shapes (2,2)/(2,4) and channel widths 3/64:
exactness on smooth flow (the generic case), the deviation being confined
to discontinuity pixels on a KITTI-like depth-edge flow, border semantics,
coordinate gradients matching the exact path where exact, and the byte-cap
fallbacks (wide-channel 4-corner gate; refused 128-lane pad -> (2,2)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tripled_tpu.ops.warp import grid_sample, grid_sample_block

BLOCKS = [(2, 2), (2, 4)]
CHANNELS = [3, 64]


def _img(b=2, h=24, w=32, c=3, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(b, h, w, c), jnp.float32)


def _smooth_coords(b, h, w, seed=1, amp=1.5):
    """Flow varying slowly (<1 px between neighbors): always exact."""
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    phase = rng.rand(b, 1, 1, 2) * 6.28
    dx = amp * np.sin(xs / 7.0 + phase[..., 0]) + rng.randn(b, 1, 1) * 0.3
    dy = amp * np.cos(ys / 9.0 + phase[..., 1]) + rng.randn(b, 1, 1) * 0.3
    coords = np.stack([xs + dx, ys + dy], -1).astype(np.float32)
    return jnp.asarray(coords)


@pytest.mark.parametrize("block", BLOCKS)
@pytest.mark.parametrize("c", CHANNELS)
def test_block_exact_on_smooth_flow(block, c):
    img = _img(c=c)
    coords = _smooth_coords(2, 24, 32)
    a = grid_sample(img, coords)
    b = grid_sample_block(img, coords, block=block)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("block", BLOCKS)
def test_block_exact_at_borders(block):
    """Coords clamped at/beyond the image border: replicate-pad semantics."""
    img = _img(1, 16, 16)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    coords = np.stack([xs * 1.2 - 2.0, ys * 1.2 - 2.0], -1)[None].astype(
        np.float32
    )  # reaches < 0 and > 15
    a = grid_sample(img, jnp.asarray(coords))
    b = grid_sample_block(img, jnp.asarray(coords), block=block)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("block", BLOCKS)
def test_block_deviation_confined_to_discontinuities(block):
    """KITTI-like flow: horizontal disparity shift with a sharp depth edge.
    Only blocks straddling the edge (spread > patch_side-1 px) may deviate;
    everything else is bit-close, and the deviating fraction is small."""
    b, h, w = 2, 48, 64
    img = _img(b, h, w)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disp = np.where(xs < w // 2, 2.0, 14.0)  # 12 px disparity jump
    coords = np.stack(
        [np.broadcast_to(xs + disp, (b, h, w)),
         np.broadcast_to(ys.astype(np.float64), (b, h, w))], -1
    ).astype(np.float32)
    a = np.asarray(grid_sample(img, jnp.asarray(coords)))
    bb = np.asarray(grid_sample_block(img, jnp.asarray(coords), block=block))
    diff = np.abs(a - bb).max(-1)  # (B, H, W)
    frac = (diff > 1e-6).mean()
    assert frac < 0.04, frac  # only the edge column of blocks deviates
    # away from the edge (one block width each side): exact
    lo, hi = w // 2 - block[1], w // 2 + block[1]
    np.testing.assert_allclose(a[:, :, :lo], bb[:, :, :lo], atol=1e-6)
    np.testing.assert_allclose(a[:, :, hi:], bb[:, :, hi:], atol=1e-6)


@pytest.mark.parametrize("block", BLOCKS)
@pytest.mark.parametrize("c", CHANNELS)
def test_block_coord_gradients_match_exact(block, c):
    img = _img(1, 16, 24, c=c)
    coords = _smooth_coords(1, 16, 24, seed=3, amp=1.0)

    def loss_exact(cc):
        return jnp.sum(grid_sample(img, cc) ** 2)

    def loss_block(cc):
        return jnp.sum(grid_sample_block(img, cc, block=block) ** 2)

    ga = jax.grad(loss_exact)(coords)
    gb = jax.grad(loss_block)(coords)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_block_pad128_cap_falls_back_to_2x2(monkeypatch):
    """(2,4) RGB needs a 72->128 lane pad; when the byte cap refuses it the
    code must fall back to (2,2) (exact + fast) rather than run a slow
    72-lane gather with the wider clamp tolerance (ADVICE r3)."""
    monkeypatch.setenv("TRIPLED_WARP_PAD64_CAP", "1")
    img = _img()
    coords = _smooth_coords(2, 24, 32)
    out = grid_sample_block(img, coords, block=(2, 4))
    ref = grid_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_wide_channel_4corner_cap_fallback(monkeypatch):
    """grid_sample with C=64: the 4C patch tensor (4x source) is gated by
    the byte cap; above it the pairwise path must produce identical
    results (ADVICE r3 medium)."""
    img = _img(c=64)
    coords = _smooth_coords(2, 24, 32, seed=5)
    ref = np.asarray(grid_sample(img, coords))  # default cap: 4-corner path
    monkeypatch.setenv("TRIPLED_WARP_PAD64_CAP", "1")
    out = np.asarray(grid_sample(img, coords))  # cap refused: pairwise path
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_block_in_model_step():
    """End-to-end smoke: mono_fm train step with warp_block_gather=True."""
    import dataclasses

    from tests.test_models import base_cfg, make_inputs
    from tripled_tpu.config import OptimConfig
    from tripled_tpu.models import build_model, canonicalize
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    cfg = canonicalize(
        dataclasses.replace(base_cfg("mono_fm"), warp_block_gather=True)
    )
    model = build_model(cfg)
    inputs = make_inputs(np.random.RandomState(0))
    tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=10)
    state = create_train_state(model, tx, inputs, seed=0)
    step = make_train_step(model, tx, donate=False)
    _, metrics = step(state, inputs, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_block_features_in_model_step():
    """End-to-end smoke: mono_fm with the 64-ch feature warp block-gathered
    and a (2,4) color block (the round-3 dark knobs, VERDICT r3 item 6)."""
    import dataclasses

    from tests.test_models import base_cfg, make_inputs
    from tripled_tpu.config import OptimConfig
    from tripled_tpu.models import build_model, canonicalize
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    cfg = canonicalize(
        dataclasses.replace(
            base_cfg("mono_fm"),
            warp_block_gather=True,
            warp_block_shape=(2, 4),
            warp_block_features=True,
        )
    )
    model = build_model(cfg)
    inputs = make_inputs(np.random.RandomState(0))
    tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=10)
    state = create_train_state(model, tx, inputs, seed=0)
    step = make_train_step(model, tx, donate=False)
    _, metrics = step(state, inputs, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_warp_block_shape_validation():
    import dataclasses

    from tripled_tpu.config import ModelConfig

    cfg = ModelConfig(warp_block_shape=[2, 4])  # lists normalize to tuples
    assert cfg.warp_block_shape == (2, 4)
    for bad in [(0, 2), (2,), (2, -1), (2.0, 2)]:
        with pytest.raises(ValueError):
            dataclasses.replace(ModelConfig(), warp_block_shape=bad)
