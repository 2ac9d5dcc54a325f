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


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int):
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(),
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else
        optax.identity(),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule
