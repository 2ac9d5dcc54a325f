"""Training loop: the `train_mono` equivalent
(`mono/apis/trainer.py:63-226` + mmcv Runner), TPU-native.

Per epoch: epoch-seeded reshuffle (DistSamplerSeedHook parity), host-threaded
batch assembly, device-sharded jitted train step, interval logging of the
itemized loss dict, Orbax checkpoint each epoch, optional Eigen eval hook.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax

from tripled_tpu.config import ExperimentConfig
from tripled_tpu.data.get_dataset import get_dataset
from tripled_tpu.data.pipeline import BatchLoader
from tripled_tpu.eval.evaluator import DepthEvaluator
from tripled_tpu.models.registry import build_model, canonicalize
from tripled_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from tripled_tpu.train import checkpoint as ckpt
from tripled_tpu.train.optim import make_optimizer
from tripled_tpu.train.state import create_train_state
from tripled_tpu.train.step import make_predict_fn, make_train_step

logger = logging.getLogger("tripled_tpu")


def get_root_logger(log_level=logging.INFO):
    """Rank-0 logger (`mono/apis/env.py:64-73` equivalent)."""
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(h)
    logger.setLevel(log_level if jax.process_index() == 0 else logging.ERROR)
    return logger


def train_mono(
    cfg: ExperimentConfig,
    train_dataset=None,
    val_dataset=None,
    max_steps_per_epoch: Optional[int] = None,
):
    """Build model/data/optimizer and run the epoch loop. Returns final state."""
    log = get_root_logger()
    model_cfg = canonicalize(cfg.model)
    model = build_model(cfg.model)

    if train_dataset is None:
        train_dataset = get_dataset(cfg.data, training=True)
    loader = BatchLoader(
        train_dataset,
        batch_size=cfg.data.batch_size,
        shuffle=cfg.data.shuffle,
        seed=cfg.seed,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )
    steps_per_epoch = max(len(loader), 1)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    tx, schedule = make_optimizer(cfg.optim, steps_per_epoch)
    mesh = make_mesh()

    sample = next(iter(loader))
    sample = {k: v for k, v in sample.items() if k != "gt_depth"}
    state = create_train_state(model, tx, jax.device_put(sample), seed=cfg.seed)
    state = jax.device_put(state, replicated_sharding(mesh))

    start_epoch = 0
    if cfg.resume_from:
        state, start_epoch = ckpt.restore_checkpoint(cfg.resume_from, state)
        log.info("resumed from %s at epoch %d", cfg.resume_from, start_epoch)
    elif cfg.finetune or cfg.load_from:
        state = ckpt.load_weights(cfg.finetune or cfg.load_from, state)
        log.info("loaded weights from %s", cfg.finetune or cfg.load_from)

    train_step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(cfg.seed)

    evaluator = None
    if cfg.validate and val_dataset is not None:
        evaluator = DepthEvaluator(
            make_predict_fn(model),
            val_dataset,
            stereo_scale=cfg.data.stereo_scale,
        )

    from tripled_tpu.utils.logging import MetricLogger

    mlogger = (
        MetricLogger(cfg.work_dir) if jax.process_index() == 0 else None
    )

    metrics_history = []
    for epoch in range(start_epoch, cfg.optim.total_epochs):
        loader.set_epoch(epoch)
        t_epoch = time.perf_counter()
        n_imgs = 0
        from tripled_tpu.data.pipeline import prefetch_to_device

        batches = prefetch_to_device(
            iter(loader), size=2, put_fn=lambda b: shard_batch(b, mesh)
        )
        for it, batch in enumerate(batches):
            if max_steps_per_epoch and it >= max_steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            n_imgs += cfg.data.batch_size * jax.process_count()
            if it % cfg.log_interval == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                lr = float(schedule(state.step))
                log.info(
                    "epoch %d iter %d/%d lr %.2e loss %.4f",
                    epoch, it, steps_per_epoch, lr, m["loss"],
                )
                if mlogger is not None:
                    mlogger.log(int(state.step), {**m, "lr": lr}, prefix="train/")
        dt = time.perf_counter() - t_epoch
        log.info(
            "epoch %d done in %.1fs (%.2f imgs/s)", epoch, dt, n_imgs / max(dt, 1e-9)
        )

        if jax.process_index() == 0 and (epoch + 1) % cfg.checkpoint_interval == 0:
            path = ckpt.save_checkpoint(cfg.work_dir, state, epoch + 1)
            log.info("saved checkpoint %s", path)

        if evaluator is not None and (epoch + 1) % cfg.validate_interval == 0:
            eval_metrics = evaluator.run(state.variables)
            metrics_history.append({"epoch": epoch + 1, **eval_metrics})
            log.info(
                "eval epoch %d: " + " ".join(f"{k}={v:.4f}" for k, v in
                                             eval_metrics.items()),
                epoch + 1,
            )
            if mlogger is not None:
                mlogger.log(int(state.step), eval_metrics, prefix="val/")

    if mlogger is not None:
        mlogger.close()
    return state, metrics_history
