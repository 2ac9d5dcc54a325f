"""Optimizer/schedule semantics vs mmcv's StepLrUpdaterHook + linear warmup."""

import jax.numpy as jnp
import numpy as np
import optax

from tripled_tpu.config import OptimConfig
from tripled_tpu.train.optim import make_lr_schedule, make_optimizer


def test_warmup_and_steps():
    cfg = OptimConfig(
        learning_rate=1e-4, warmup_iters=500, warmup_ratio=1 / 3,
        lr_steps=(20, 30), lr_gamma=0.5, total_epochs=40,
    )
    spe = 100  # steps per epoch
    sched = make_lr_schedule(cfg, spe)
    # mmcv linear warmup: lr(0) = base*ratio, lr(W) = base
    np.testing.assert_allclose(float(sched(0)), 1e-4 / 3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(250)), 1e-4 * (1 - 0.5 * 2 / 3), rtol=1e-5)
    np.testing.assert_allclose(float(sched(500)), 1e-4, rtol=1e-6)
    # step decay at epoch milestones
    np.testing.assert_allclose(float(sched(19 * spe)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20 * spe)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(30 * spe)), 2.5e-5, rtol=1e-6)


def test_grad_clip_global_norm():
    cfg = OptimConfig(grad_clip_norm=1.0, warmup_iters=1)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    big = {"w": jnp.asarray([30.0, 40.0, 0.0])}  # norm 50 -> clipped to 1
    updates, _ = tx.update(big, state, params)
    # after clip, Adam normalizes: update magnitude bounded by lr
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    assert np.abs(np.asarray(updates["w"])).max() <= cfg.learning_rate * 1.01


def test_paramwise_options():
    import jax

    cfg = OptimConfig(
        learning_rate=1e-2, weight_decay=0.0, warmup_iters=1,
        bias_lr_mult=2.0,
    )
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {
        "Conv_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
        "BatchNorm_0": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # identical grads -> Adam gives identical magnitudes; bias gets 2x lr
    kmag = float(np.abs(np.asarray(updates["Conv_0"]["kernel"])).mean())
    bmag = float(np.abs(np.asarray(updates["Conv_0"]["bias"])).mean())
    nmag = float(np.abs(np.asarray(updates["BatchNorm_0"]["bias"])).mean())
    np.testing.assert_allclose(bmag, 2 * kmag, rtol=1e-5)
    np.testing.assert_allclose(nmag, kmag, rtol=1e-5)  # norm biases excluded


def test_weight_decay_coupled_matches_torch_adam():
    """wd is coupled into the gradient BEFORE the Adam moments (torch Adam
    L2 semantics, `mono/apis/trainer.py:77-144`), not decoupled AdamW."""
    import jax
    import torch

    wd, lr = 0.1, 1e-2
    w0 = np.asarray([0.7, -1.3, 2.1], np.float32)
    g0 = np.asarray([0.3, 0.5, -0.2], np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for _ in range(3):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g0.copy())
        topt.step()

    cfg = OptimConfig(learning_rate=lr, weight_decay=wd, warmup_iters=1,
                      warmup_ratio=1.0, grad_clip_norm=1e9)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g0)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-5, atol=2e-6
    )
