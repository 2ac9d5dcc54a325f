"""Optimizer & LR schedule (optax), matching the reference's mmcv setup:
Adam(lr, wd=0) + global-norm grad clip 35 + step LR policy with 500-iter
linear warmup at ratio 1/3 (`config/cfg_kitti_*.py` `optimizer`/`lr_config`,
`mono/apis/trainer.py:77-144`, mmcv StepLrUpdaterHook semantics)."""

from __future__ import annotations

import optax

from tripled_tpu.config import OptimConfig


def make_lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """mmcv 'step' policy with 'linear' warmup.

    warmup: lr_t = base * (1 - (1 - t/W) * (1 - ratio)); after warmup the LR
    is base * gamma^(#milestones passed), milestones in epochs.
    """
    base = cfg.learning_rate
    W = max(cfg.warmup_iters, 1)
    milestones = sorted(cfg.lr_steps)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        epoch = step / steps_per_epoch
        decay = cfg.lr_gamma ** sum(
            [(epoch >= m).astype(jnp.float32) for m in milestones]
        )
        regular = base * decay
        frac = jnp.clip(step / W, 0.0, 1.0)
        warm = regular * (1.0 - (1.0 - frac) * (1.0 - cfg.warmup_ratio))
        return jnp.where(step < W, warm, regular)

    return schedule


def _param_kind(path) -> str:
    """'norm' (BatchNorm scale/bias), 'bias' (other biases), or 'default' —
    the reference's regex-on-name grouping (`trainer.py:125-139`)."""
    keys = [getattr(k, "key", str(k)) for k in path]
    leaf = keys[-1]
    if any(str(k).startswith("BatchNorm") for k in keys) or leaf == "scale":
        return "norm"
    if leaf == "bias":
        return "bias"
    return "default"


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch)

    def wd_for(kind):
        if kind == "norm":
            return cfg.weight_decay * cfg.norm_decay_mult
        if kind == "bias":
            return cfg.weight_decay * cfg.bias_decay_mult
        return cfg.weight_decay

    def lr_mult_for(kind):
        return cfg.bias_lr_mult if kind == "bias" else 1.0

    uses_paramwise = (
        cfg.bias_lr_mult != 1.0
        or (cfg.weight_decay and (cfg.bias_decay_mult != 1.0
                                  or cfg.norm_decay_mult != 1.0))
    )

    # Weight decay is COUPLED (added to the gradient before the Adam moment
    # estimates), matching torch.optim.Adam's L2 semantics the reference uses
    # (`mono/apis/trainer.py:77-144`, torch Adam `weight_decay`), not AdamW.
    # All shipped reference configs set wd=0, but paramwise decay multipliers
    # flow through this path too.
    if not uses_paramwise:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay
            else optax.identity(),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
        return tx, schedule

    import jax

    def scale_tree(updates, params=None, fn=lr_mult_for):
        return jax.tree_util.tree_map_with_path(
            lambda path, u: u * fn(_param_kind(path)), updates
        )

    def paramwise_wd():
        def update(updates, state, params):
            upd = jax.tree_util.tree_map_with_path(
                lambda path, u, p: u + wd_for(_param_kind(path)) * p,
                updates, params,
            )
            return upd, state

        return optax.GradientTransformation(lambda p: optax.EmptyState(), update)

    def paramwise_lr_mult():
        def update(updates, state, params=None):
            return scale_tree(updates), state

        return optax.GradientTransformation(lambda p: optax.EmptyState(), update)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        paramwise_wd() if cfg.weight_decay else optax.identity(),
        optax.scale_by_adam(),
        paramwise_lr_mult(),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule
