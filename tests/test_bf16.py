"""Mixed-precision (compute_dtype='bfloat16') path.

The conv trunks run bf16 (params cast inside loss_fn by make_train_step,
inputs cast at encoder entries in net.py); losses / warp geometry / BN stats /
Adam state stay f32. These tests pin the contract: master params and grads
remain f32, the step produces finite losses, and the bf16 loss tracks the
f32 loss to bf16 rounding (~1e-2 rel) at init.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_models import base_cfg, make_inputs
from tripled_tpu.config import OptimConfig
from tripled_tpu.models import build_model, canonicalize
from tripled_tpu.train.optim import make_optimizer
from tripled_tpu.train.state import TrainState
from tripled_tpu.train.step import make_train_step


def _run_one_step(name, compute_dtype, with_mask):
    cfg = canonicalize(base_cfg(name, compute_dtype=compute_dtype))
    model = build_model(cfg)
    rng_np = np.random.RandomState(0)
    inputs = make_inputs(rng_np, with_mask=with_mask)
    variables = model.init(
        dict(
            params=jax.random.PRNGKey(0),
            dropout=jax.random.PRNGKey(1),
            automask=jax.random.PRNGKey(2),
            crop=jax.random.PRNGKey(3),
            rotation=jax.random.PRNGKey(4),
        ),
        inputs,
        train=True,
    )
    tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=10)
    state = TrainState(
        step=0,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step = make_train_step(model, tx, donate=False)
    new_state, metrics = step(state, inputs, jax.random.PRNGKey(7))
    return new_state, metrics


def test_bf16_flagship_step_finite_and_f32_master():
    new_state, metrics = _run_one_step(
        "mono_fm_joint_inpaint_disentangle", "bfloat16", with_mask=True
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    # master params, BN stats and Adam state remain f32
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new_state.batch_stats):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(new_state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # losses are f32 scalars (cast back at the network boundaries)
    for v in metrics.values():
        assert jnp.asarray(v).dtype == jnp.float32


def test_bf16_loss_tracks_f32():
    _, m16 = _run_one_step("mono_fm", "bfloat16", with_mask=False)
    _, m32 = _run_one_step("mono_fm", "float32", with_mask=False)
    l16, l32 = float(m16["loss"]), float(m32["loss"])
    assert np.isfinite(l16) and np.isfinite(l32)
    assert abs(l16 - l32) / abs(l32) < 5e-2, (l16, l32)


def test_bf16_feature_losses_track_f32():
    """The r5 bf16 feature-loss path (feature_regularization_loss +
    perceptional_loss elementwise in bf16, reductions f32) must track the
    f32 values per loss term on the joint-extractor flagship, which
    exercises both ops at feature scale."""
    _, m16 = _run_one_step(
        "mono_fm_joint_inpaint_disentangle", "bfloat16", with_mask=True
    )
    _, m32 = _run_one_step(
        "mono_fm_joint_inpaint_disentangle", "float32", with_mask=True
    )
    for key in m32:
        if "feature_regularization" in key or "perceptional" in key:
            v16, v32 = float(m16[key]), float(m32[key])
            assert np.isfinite(v16) and np.isfinite(v32), (key, v16, v32)
            denom = max(abs(v32), 1e-3)
            assert abs(v16 - v32) / denom < 6e-2, (key, v16, v32)


def test_feature_losses_f32_inputs_bit_identical():
    """With f32 inputs the added astype(f32) reductions are no-ops: the op
    outputs must be bit-identical to a direct f32 computation."""
    from tripled_tpu.ops.losses import (
        feature_regularization_loss,
        perceptional_loss,
    )

    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.randn(2, 12, 20, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 12, 20, 8).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 48, 80, 3).astype(np.float32))
    p = perceptional_loss(f, g)
    assert p.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(p),
        np.asarray(jnp.mean(jnp.sqrt((f - g) ** 2 + 1e-6), axis=-1, keepdims=True)),
    )
    r = feature_regularization_loss(f, img, dis=1e-3, cvt=1e-3)
    assert r.dtype == jnp.float32 and np.isfinite(float(r))


def test_f32_default_unchanged():
    # compute_dtype defaults to float32 — the cast helpers must be no-ops
    cfg = canonicalize(base_cfg("mono_baseline"))
    assert cfg.compute_dtype == "float32"
    _, m = _run_one_step("mono_baseline", "float32", with_mask=False)
    assert np.isfinite(float(m["loss"]))
