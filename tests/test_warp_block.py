"""grid_sample_block (2x2 output-block gather) vs the exact bilinear warp.

The block path is exact wherever a 2x2 output block's 4 sample points land
within 3 px of the block's floor(min) anchor; violating samples clamp to
the patch edge. These tests pin: exactness on smooth flow (the generic
case), the deviation being confined to discontinuity pixels on a
KITTI-like depth-edge flow, border semantics, and coordinate gradients
matching the exact path where exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tripled_tpu.ops.warp import grid_sample, grid_sample_block


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


def test_block_exact_on_smooth_flow():
    img = _img()
    coords = _smooth_coords(2, 24, 32)
    a = grid_sample(img, coords)
    b = grid_sample_block(img, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_block_exact_at_borders():
    """Coords clamped at/beyond the image border: replicate-pad semantics."""
    img = _img(1, 16, 16)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    coords = np.stack([xs * 1.2 - 2.0, ys * 1.2 - 2.0], -1)[None].astype(
        np.float32
    )  # reaches < 0 and > 15
    a = grid_sample(img, jnp.asarray(coords))
    b = grid_sample_block(img, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_block_deviation_confined_to_discontinuities():
    """KITTI-like flow: horizontal disparity shift with a sharp depth edge.
    Only blocks straddling the edge (spread > 3 px) may deviate; everything
    else is bit-close, and the deviating fraction is small."""
    b, h, w = 2, 48, 64
    img = _img(b, h, w)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disp = np.where(xs < w // 2, 2.0, 14.0)  # 12 px disparity jump
    coords = np.stack(
        [np.broadcast_to(xs + disp, (b, h, w)),
         np.broadcast_to(ys.astype(np.float64), (b, h, w))], -1
    ).astype(np.float32)
    a = np.asarray(grid_sample(img, jnp.asarray(coords)))
    bb = np.asarray(grid_sample_block(img, jnp.asarray(coords)))
    diff = np.abs(a - bb).max(-1)  # (B, H, W)
    frac = (diff > 1e-6).mean()
    assert frac < 0.04, frac  # only the edge column of blocks deviates
    # away from the edge: exact
    np.testing.assert_allclose(a[:, :, : w // 2 - 2], bb[:, :, : w // 2 - 2],
                               atol=1e-6)
    np.testing.assert_allclose(a[:, :, w // 2 + 2 :], bb[:, :, w // 2 + 2 :],
                               atol=1e-6)


def test_block_coord_gradients_match_exact():
    img = _img(1, 16, 24)
    coords = _smooth_coords(1, 16, 24, seed=3, amp=1.0)

    def loss_exact(cc):
        return jnp.sum(grid_sample(img, cc) ** 2)

    def loss_block(cc):
        return jnp.sum(grid_sample_block(img, cc) ** 2)

    ga = jax.grad(loss_exact)(coords)
    gb = jax.grad(loss_block)(coords)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


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
