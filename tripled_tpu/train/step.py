"""Jitted train / predict steps with mesh data parallelism.

Replaces `batch_processor` + `DistOptimizerHook.after_train_iter`
(`mono/apis/trainer.py:30-60`, `mono/core/utils/dist_utils.py:47-60`):
loss = Σ mean(loss_dict values) → grads → (XLA-inserted) cross-chip reduce →
global-norm clip (inside optax chain) → Adam update. The whole step is one
compiled program; there is no separate gradient-sync hook to schedule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tripled_tpu.train.state import TrainState


def _cast_floating(tree, dtype):
    """Cast floating-point leaves (the conv/dense kernels) to `dtype`.

    Used for the mixed-precision path (ModelConfig.compute_dtype='bfloat16'):
    master params stay f32 in TrainState / Adam; the cast happens *inside*
    loss_fn, so autodiff routes gradients back through it and grads come out
    f32. Params are rounded to bf16 everywhere (standard mixed precision),
    but branches whose *inputs* stay f32 (pose nets, sep_* encoders) still
    *compute* in f32 via flax's dtype=None promotion rules — only the
    trunks net.py explicitly feeds bf16 inputs run bf16 math.
    """
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def make_train_step(model, tx, donate: bool = True) -> Callable:
    compute_dtype = getattr(getattr(model, "cfg", None), "compute_dtype", "float32")

    def train_step(state: TrainState, batch, rng):
        rngs = dict(
            zip(
                ("dropout", "automask", "crop", "rotation"),
                jax.random.split(rng, 4),
            )
        )

        def loss_fn(params):
            if compute_dtype == "bfloat16":
                params = _cast_floating(params, jnp.bfloat16)
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (outputs, loss_dict), mutated = model.apply(
                variables,
                batch,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            total = sum(jnp.asarray(v) for v in loss_dict.values())
            return total, (loss_dict, mutated.get("batch_stats", {}))

        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = dict(loss_dict)
        metrics["loss"] = total
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_predict_fn(model) -> Callable:
    """Batched eval-mode disparity prediction: images (B, 1, H, W, 3) →
    scale-0 *scaled* disparity (B, h, w, 1), i.e. disp_to_depth's scaled_disp
    — what `scripts/eval_depth.py:58-61` collects (depth = 1/scaled_disp)."""
    from tripled_tpu.ops import disp_to_depth

    cfg = model.cfg

    @jax.jit
    def predict(variables, images):
        disps = model.apply(variables, {"color_aug": images, "color": images},
                            train=False)
        scaled, _ = disp_to_depth(disps[0], cfg.min_depth, cfg.max_depth)
        return scaled

    return predict
