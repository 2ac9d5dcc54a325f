"""Batched, sharded, prefetching input pipeline.

Replaces the reference's torch DataLoader + DistributedGroupSampler stack
(`mono/datasets/loader/build_loader.py:18-54`, `loader/sampler.py:82-163`)
with a TPU-friendly design:

- deterministic epoch-seeded global shuffle, padded to global-batch
  divisibility, then a contiguous per-process slice (exactly the
  DistributedGroupSampler contract, minus the aspect-ratio groups KITTI
  never exercises);
- a thread pool decodes/augments samples into fixed-shape numpy batches
  (drop_last=True like the reference);
- `prefetch_to_device` keeps a double buffer of batches on device so the
  TPU never waits on host decode.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 1024,
        num_workers: int = 4,
        num_shards: int = 1,
        shard_index: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        g = np.random.RandomState(self.seed + self.epoch)
        idx = g.permutation(n) if self.shuffle else np.arange(n)
        global_batch = self.batch_size * self.num_shards
        if self.drop_last:
            total = (n // global_batch) * global_batch
            idx = idx[:total]
        else:
            pad = (-n) % global_batch
            idx = np.concatenate([idx, idx[:pad]])
        # contiguous per-shard slice (DistributedGroupSampler:139-151)
        per = len(idx) // max(self.num_shards, 1)
        return idx[self.shard_index * per : (self.shard_index + 1) * per]

    def __len__(self):
        return len(self._epoch_indices()) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        bs = self.batch_size
        batches = [indices[i : i + bs] for i in range(0, len(indices) - bs + 1, bs)]

        def make_sample(args):
            pos, ds_index = args
            rng = np.random.RandomState(
                (self.seed + self.epoch * 1_000_003 + int(ds_index)) % (2**31)
            )
            return self.dataset.sample(int(ds_index), rng)

        if self.num_workers <= 1:
            for batch_idx in batches:
                samples = [make_sample((i, j)) for i, j in enumerate(batch_idx)]
                yield _collate(samples)
            return

        # pipelined thread pool: decode batch k+1 while batch k trains
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(2):
                b = next(it, None)
                if b is not None:
                    pending.append(pool.map(make_sample, list(enumerate(b))))
            while pending:
                samples = list(pending.pop(0))
                b = next(it, None)
                if b is not None:
                    pending.append(pool.map(make_sample, list(enumerate(b))))
                yield _collate(samples)


def _collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if k == "gt_depth":
            out[k] = vals  # variable-shape: stays a host-side list
        else:
            out[k] = np.stack(vals)
    return out


def prefetch_to_device(iterator, size: int = 2, sharding=None, put_fn=None):
    """Async host→device transfer with a bounded queue (double buffering).

    `put_fn` overrides the transfer (e.g. `shard_batch` onto a mesh);
    otherwise `jax.device_put` with the optional sharding is used.
    """

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def _put(host):
        if put_fn is not None:
            return put_fn(host)
        if sharding is not None:
            return jax.device_put(host, sharding)
        return jax.device_put(host)

    def producer():
        try:
            for batch in iterator:
                host = {k: v for k, v in batch.items() if k != "gt_depth"}
                dev = _put(host)
                if "gt_depth" in batch:
                    dev = dict(dev, gt_depth=batch["gt_depth"])
                q.put(dev)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
