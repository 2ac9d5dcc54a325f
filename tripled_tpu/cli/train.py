"""Training CLI (`train.py` equivalent).

Usage:
  python -m tripled_tpu.cli.train --config configs/cfg_kitti_tripled.py \
      --work_dir work/tripled [--resume_from ...] [--seed 1024]

No torch.distributed.launch: multi-chip data parallelism comes from the
device mesh (single process per host; run one process per host for
multi-host pods — jax.distributed handles the rest).
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parse_args():
    p = argparse.ArgumentParser(description="Train a TripleD-TPU model")
    p.add_argument("--config", required=True, help="python config file")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--finetune", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument(
        "--auto_resume", action="store_true",
        help="resume from <work_dir>/ckpt/latest when present (preemption "
             "recovery; the reference only supports explicit --resume_from)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # multi-host pods: one process per host, coordinated via the standard
    # JAX env vars (the reference's torch.distributed.launch equivalent)
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        import jax

        jax.distributed.initialize()
    from tripled_tpu.config import dump_config, load_config
    from tripled_tpu.data.get_dataset import get_dataset
    from tripled_tpu.train.loop import get_root_logger, train_mono

    cfg = load_config(args.config)
    updates = {}
    if args.work_dir:
        updates["work_dir"] = args.work_dir
    if args.resume_from:
        updates["resume_from"] = args.resume_from
    if args.finetune:
        updates["finetune"] = args.finetune
    if args.seed is not None:
        updates["seed"] = args.seed
    if updates:
        cfg = dataclasses.replace(cfg, **updates)
    if args.auto_resume and not cfg.resume_from:
        latest = os.path.join(cfg.work_dir, "ckpt", "latest")
        if os.path.exists(latest):
            cfg = dataclasses.replace(cfg, resume_from=cfg.work_dir)

    log = get_root_logger()
    os.makedirs(cfg.work_dir, exist_ok=True)
    dump_config(cfg, os.path.join(cfg.work_dir, "config_dump.py"))
    log.info("model: %s; work_dir: %s", cfg.model.name, cfg.work_dir)

    val_ds = None
    if cfg.validate:
        try:
            val_ds = get_dataset(cfg.data, training=False)
        except FileNotFoundError as e:
            log.warning("validation dataset unavailable: %s", e)

    train_mono(cfg, val_dataset=val_ds,
               max_steps_per_epoch=args.max_steps_per_epoch)


if __name__ == "__main__":
    main()
