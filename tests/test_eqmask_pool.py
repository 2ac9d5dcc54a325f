"""Equality-mask CRP maxpool backward (`max_pool_5x5_same_eqmask`,
ModelConfig.pool_eqmask_grad — opt-in replacement for XLA's
select-and-scatter, 13.7 ms/step of the round-4 profile).

Contract (models/layers.py docstring): forward bit-identical; backward
BITWISE identical to select-and-scatter on tie-free input; exact
within-window ties route the cotangent to ALL tied positions where SAS
(and the reference's F.max_pool2d,
/root/reference/mono/model/mono_fm/layers.py:200-215) picks one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tripled_tpu.models.layers import (
    CRPBlock,
    max_pool_5x5_same,
    max_pool_5x5_same_eqmask,
)


def _grad(fn, x, seed=0):
    g = np.random.RandomState(seed).randn(*fn(x).shape).astype(x.dtype)
    return jax.jit(
        lambda x: jax.vjp(fn, x)[1](jnp.asarray(g, x.dtype))[0]
    )(x)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bit_identical(dtype):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 20, 5), dtype)
    a = jax.jit(max_pool_5x5_same)(x)
    b = jax.jit(max_pool_5x5_same_eqmask)(x)
    assert a.dtype == b.dtype == dtype
    assert bool(jnp.all(a == b))


def test_backward_bitwise_on_tie_free_input():
    # continuous random floats: within-window ties are measure-zero
    x = jnp.asarray(np.random.RandomState(1).randn(3, 24, 40, 8), jnp.float32)
    ga = _grad(max_pool_5x5_same, x)
    gb = _grad(max_pool_5x5_same_eqmask, x)
    assert bool(jnp.all(ga == gb)), float(jnp.max(jnp.abs(ga - gb)))


def test_backward_interior_border_and_negative_values():
    # all-negative input exercises the padding path: the -inf/+inf pads
    # must never match or win a window
    x = -jnp.abs(
        jnp.asarray(np.random.RandomState(2).randn(1, 9, 11, 2), jnp.float32)
    ) - 1.0
    ga = _grad(max_pool_5x5_same, x, seed=3)
    gb = _grad(max_pool_5x5_same_eqmask, x, seed=3)
    assert bool(jnp.all(ga == gb))


def test_tie_averages_over_tied_positions():
    # two equal maxima inside shared windows: SAS concentrates each tied
    # output's cotangent on one position; eq-mask AVERAGES it over both
    # (mass-conserving — the documented deviation)
    # tie-free random background in [0,1) + two tied maxima of 7.0 that
    # share the windows of outputs (2..4, 2..4): the ONLY tied windows
    x = np.random.RandomState(5).rand(1, 9, 9, 1).astype(np.float32)
    x[0, 2, 2, 0] = x[0, 4, 4, 0] = 7.0
    x = jnp.asarray(x)

    def loss(fn):
        return jax.grad(lambda x: fn(x).sum())(x)

    g_eq = loss(max_pool_5x5_same_eqmask)
    g_sas = loss(max_pool_5x5_same)
    # total routed mass is conserved either way
    np.testing.assert_allclose(
        float(g_eq.sum()), float(g_sas.sum()), rtol=1e-6
    )
    # both tied positions receive gradient under eq-mask; the 9 tied
    # windows contribute 0.5 each, split evenly
    assert float(g_eq[0, 2, 2, 0]) > 0 and float(g_eq[0, 4, 4, 0]) > 0
    np.testing.assert_allclose(
        float(g_eq[0, 2, 2, 0]), float(g_eq[0, 4, 4, 0]), rtol=1e-6
    )
    # gradient differs ONLY at the two tied positions
    mask = np.ones((1, 9, 9, 1), bool)
    mask[0, 2, 2, 0] = mask[0, 4, 4, 0] = False
    assert bool(jnp.all(jnp.where(mask, g_eq, 0) == jnp.where(mask, g_sas, 0)))


@pytest.mark.parametrize("eqmask", [False, True])
def test_crp_block_flag(eqmask):
    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 16, 6), jnp.float32)
    blk = CRPBlock(6, 4, eqmask_pool=eqmask)
    variables = blk.init(jax.random.PRNGKey(0), x)
    ref = CRPBlock(6, 4, eqmask_pool=False)

    y = jax.jit(lambda v, x: blk.apply(v, x))(variables, x)
    y_ref = jax.jit(lambda v, x: ref.apply(v, x))(variables, x)
    assert bool(jnp.all(y == y_ref))

    g = jax.jit(
        jax.grad(lambda x: (blk.apply(variables, x) ** 2).sum())
    )(x)
    g_ref = jax.jit(
        jax.grad(lambda x: (ref.apply(variables, x) ** 2).sum())
    )(x)
    # stages 2-4 pool plateaued (tied) inputs: eq-mask averages where SAS
    # concentrates, so grads differ at plateau positions — by a tiny,
    # mass-conserving amount (measured rel-L2 1.6e-7 here)
    g, g_ref = np.asarray(g), np.asarray(g_ref)
    assert np.linalg.norm(g - g_ref) <= 1e-5 * np.linalg.norm(g_ref)


def test_model_config_flag_builds_and_trains():
    import dataclasses

    from tripled_tpu.config import ModelConfig, OptimConfig
    from tripled_tpu.models import build_model, canonicalize
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step
    from tripled_tpu.utils.inputs import dummy_train_inputs

    base = canonicalize(
        ModelConfig(
            name="mono_fm",
            depth_num_layers=18,
            pose_num_layers=18,
            extractor_num_layers=18,
            height=96,
            width=320,
            pose_height=96,
            pose_width=320,
        )
    )
    cfg = dataclasses.replace(base, pool_eqmask_grad=True)
    model = build_model(cfg)
    batch = dummy_train_inputs(cfg, 2, seed=0)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=2), steps_per_epoch=4)
    state = create_train_state(model, tx, batch, seed=0)
    step = make_train_step(model, tx, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
