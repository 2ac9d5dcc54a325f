"""Device-mesh data parallelism (replaces torch.distributed/NCCL DDP)."""

from tripled_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
