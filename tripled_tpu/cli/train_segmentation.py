"""Segmentation training CLI (the reference intends this via train.py +
the SEGMENTATION registry, but ships the models missing; this works).

Usage:
  python -m tripled_tpu.cli.train_segmentation \
      --config configs/cfg_kitti_fm_joint_inpaint_segmentation.py \
      --work_dir work/seg [--model FixSegmentationDepth] \
      [--depth_checkpoint work/tripled/ckpt/epoch_20]
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--work_dir", default=None)
    p.add_argument("--model", default="FixSegmentationDepth")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument(
        "--depth_checkpoint", default=None,
        help="Orbax checkpoint of a depth run; its depth encoder initializes "
             "the (frozen, for Fix*) segmentation encoder",
    )
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from tripled_tpu.config import load_config
    from tripled_tpu.data.pipeline import BatchLoader
    from tripled_tpu.data.seg_datasets import (
        get_segmentation_train_dataset,
        get_test_segmentation_dataset,
    )
    from tripled_tpu.eval.segmentation_metrics import SegmentationRunningScore
    from tripled_tpu.models.segmentation import build_segmentation_model
    from tripled_tpu.train import checkpoint as ckpt
    from tripled_tpu.train.loop import get_root_logger
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import TrainState
    from tripled_tpu.utils.logging import MetricLogger

    log = get_root_logger()
    cfg = load_config(args.config)
    if args.work_dir:
        cfg = dataclasses.replace(cfg, work_dir=args.work_dir)
    os.makedirs(cfg.work_dir, exist_ok=True)

    train_ds = get_segmentation_train_dataset(cfg.data)
    loader = BatchLoader(train_ds, batch_size=cfg.data.batch_size,
                         seed=cfg.seed)
    steps_per_epoch = max(len(loader), 1)
    tx, schedule = make_optimizer(cfg.optim, steps_per_epoch)

    model = build_segmentation_model(cfg.model, args.model, args.num_classes)
    rng = np.random.RandomState(0)
    sample = train_ds.sample(0, rng)
    init_batch = jax.device_put(
        {"image": sample["image"][None], "label": sample["label"][None]}
    )
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           init_batch, train=True)
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    if args.depth_checkpoint:
        # transplant the depth encoder weights by matching subtree name
        from tripled_tpu.models.registry import build_model
        from tripled_tpu.train.state import create_train_state
        from tripled_tpu.utils.inputs import dummy_train_inputs

        depth_model = build_model(cfg.model)
        d_state = create_train_state(
            depth_model, tx, jax.device_put(dummy_train_inputs(cfg.model, 1)),
            seed=0,
        )
        d_state, _ = ckpt.restore_checkpoint(args.depth_checkpoint, d_state)
        state = dataclasses.replace(
            state,
            params={**state.params, "encoder": d_state.params["depth_encoder"]},
            batch_stats={
                **state.batch_stats,
                "encoder": d_state.batch_stats["depth_encoder"],
            },
        )
        log.info("initialized encoder from %s", args.depth_checkpoint)

    @jax.jit
    def train_step(state, batch):
        def loss_fn(params):
            v = {"params": params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            (out, ld), mut = model.apply(v, batch, train=True,
                                         mutable=["batch_stats"])
            return ld["seg_ce_loss"], mut.get("batch_stats", {})

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=stats, opt_state=opt_state), loss

    mlogger = MetricLogger(cfg.work_dir)
    for epoch in range(cfg.optim.total_epochs):
        loader.set_epoch(epoch)
        for it, batch in enumerate(loader):
            if args.max_steps_per_epoch and it >= args.max_steps_per_epoch:
                break
            state, loss = train_step(state, jax.device_put(batch))
            if it % cfg.log_interval == 0:
                log.info("epoch %d iter %d loss %.4f", epoch, it, float(loss))
                mlogger.log(int(state.step), {"seg_ce_loss": float(loss)},
                            prefix="train/")
        ckpt.save_checkpoint(cfg.work_dir, state, epoch + 1)

        # eval mIoU/acc each epoch (the missing reference eval hook)
        val_ds = get_test_segmentation_dataset(cfg.data, val=False)
        scores = SegmentationRunningScore(args.num_classes)
        for i in range(len(val_ds)):
            s = val_ds.sample(i, rng)
            if "label" not in s:
                continue
            log_probs = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                {"image": s["image"][None]}, train=False,
            )
            scores.update(s["label"][None], np.asarray(log_probs).argmax(-1))
        m = scores.get_scores()
        log.info("epoch %d: miou %.4f acc %.4f", epoch, m["meaniou"],
                 m["meanacc"])
        mlogger.log(int(state.step),
                    {"miou": m["meaniou"], "acc": m["meanacc"]}, prefix="val/")
    mlogger.close()


if __name__ == "__main__":
    main()
