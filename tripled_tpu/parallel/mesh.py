"""Mesh / sharding helpers.

The reference's parallelism is data-parallel NCCL DDP with a manual coalesced
grad all-reduce (`mono/core/utils/dist_utils.py:12-60`) plus
DistributedGroupSampler input sharding. TPU-native equivalent: one
`jax.sharding.Mesh` over all chips with a single `data` axis; the train step
is `jit`-ed with the batch sharded over `data` and params replicated, so XLA
inserts the gradient reduce-scatter/all-reduce over ICI itself. SyncBN falls
out for free: batch-norm reductions under jit+sharding are global-batch.

Multi-host: each process feeds its `jax.process_index()` slice
(`BatchLoader(num_shards=jax.process_count(), ...)`) and
`jax.make_array_from_process_local_data` assembles the global batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh.

    Works single-process (device_put with a NamedSharding) and multi-process
    (make_array_from_process_local_data over the per-host slice).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
