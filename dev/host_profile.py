"""Name the host-side e2e wall (VERDICT r3 item 2): per-stage timing of the
exact warm-cache pipeline bench_e2e runs (on-disk 375x1242 tree -> decode
cache -> MonoDataset.sample -> BatchLoader threads -> collate -> uint8
device_put). The reference's equivalent layer is
/root/reference/mono/datasets/loader/build_loader.py:18-54 (torch
DataLoader + worker processes); this host has ONE core, so the question is
where the serial 1-core budget goes, not how to parallelize it.

Usage: python dev/host_profile.py [batch=16]
Stages reported as imgs/s and ms/img; run on a quiet host.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402

from tripled_tpu.config import DataConfig  # noqa: E402
from tripled_tpu.data.get_dataset import get_dataset  # noqa: E402
from tripled_tpu.data.pipeline import BatchLoader, _collate  # noqa: E402
from tripled_tpu.data.synthetic import make_kitti_tree  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    root = os.environ.get("BENCH_E2E_TREE", "/tmp/bench_e2e_kitti")
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "82"))
    marker = os.path.join(root, "splits", "synthetic", "train_files.txt")
    if not os.path.exists(marker):
        make_kitti_tree(root, num_frames=n_frames, height=375, width=1242)
    os.environ["TRIPLED_SPLITS_DIR"] = os.path.join(root, "splits")

    cfg = bench.mono_fm_cfg()
    data_cfg = DataConfig(
        name="kitti",
        split="synthetic",
        in_path=root,
        height=cfg.height,
        width=cfg.width,
        batch_size=batch,
        decode_cache_mb=int(os.environ.get("BENCH_E2E_CACHE_MB", "4096")),
        device_color_aug=True,
        ship_uint8=True,
    )
    ds = get_dataset(data_cfg, training=True)
    n = len(ds)

    # ---- warm the decode cache (cold pass, timed for reference)
    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for i in range(n):
        ds.sample(i, rng)
    cold = time.perf_counter() - t0

    def rate(dt, imgs):
        return f"{imgs / dt:8.2f} imgs/s  {1e3 * dt / imgs:7.2f} ms/img"

    print(f"cold sample() epoch      : {rate(cold, n)}")

    # ---- warm sample() (decode-cache hits); two passes, the second
    # (fully warm) pass is the reported timing (ADVICE r4)
    for _ in range(2):
        rng = np.random.RandomState(1)
        t0 = time.perf_counter()
        for i in range(n):
            ds.sample(i, rng)
        warm = time.perf_counter() - t0
    print(f"warm sample() epoch      : {rate(warm, n)}")

    # ---- warm frame load alone (3 cache gets + flip view)
    t0 = time.perf_counter()
    for i in range(n):
        ds.load_frames(i, do_flip=(i % 2 == 0))
    tl = time.perf_counter() - t0
    print(f"  load_frames (3 hits)   : {rate(tl, n)}")

    # ---- collate
    rng = np.random.RandomState(2)
    samples = [ds.sample(i, rng) for i in range(batch)]
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        b = _collate(samples)
    tc = time.perf_counter() - t0
    print(f"  collate bs{batch}        : {rate(tc, reps * batch)}")

    # ---- BatchLoader end-to-end (threads + shuffle), warm, no device
    loader = BatchLoader(ds, batch_size=batch, shuffle=True, seed=0)
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        m = 0
        for b in loader:
            m += batch
        te = time.perf_counter() - t0
    print(f"warm BatchLoader epoch   : {rate(te, m)}")

    # ---- device transfer + dispatch overhead (uint8 batch put)
    import jax

    dev = jax.devices()[0]
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        placed = jax.device_put(b, dev)
        jax.block_until_ready(placed)
    tp = time.perf_counter() - t0
    nbytes = sum(
        v.nbytes for v in jax.tree_util.tree_leaves(b)
    )
    print(
        f"device_put bs{batch}       : {rate(tp, reps * batch)}"
        f"  ({nbytes / 1e6:.1f} MB/batch, {nbytes * reps / tp / 1e9:.2f} GB/s)"
    )


if __name__ == "__main__":
    main()
