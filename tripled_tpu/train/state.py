"""Train state: params + batch_stats + optimizer state + step counter."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(model, tx, sample_inputs, seed: int = 0) -> TrainState:
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "dropout": jax.random.PRNGKey(seed + 1),
        "automask": jax.random.PRNGKey(seed + 2),
        "crop": jax.random.PRNGKey(seed + 3),
        "rotation": jax.random.PRNGKey(seed + 4),
    }
    init_fn = lambda r, s: model.init(r, s, train=True)
    if jax.default_backend() == "tpu":
        # On the remote-compile TPU platform an eager init pays a ~1-min
        # tunnel round-trip PER tiny op (hundreds of them); one jitted
        # compile of the whole init graph is dramatically faster cold and
        # hits the persistent compile cache warm.
        init_fn = jax.jit(init_fn)
    variables = init_fn(rngs, sample_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
