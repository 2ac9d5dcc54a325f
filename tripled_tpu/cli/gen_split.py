"""Generate split files from a KITTI-raw-layout directory
(`mono/datasets/splits/kitti_shot_sequence/gen_split.py` equivalent).

Usage:
  python -m tripled_tpu.cli.gen_split --data_path /data/kitti_raw \
      --out_dir splits/my_split [--side l] [--val_frac 0.1]
"""

from __future__ import annotations

import argparse
import os
import random


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--side", default="l", choices=["l", "r"])
    p.add_argument("--val_frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=1024)
    args = p.parse_args()

    cam = {"l": "image_02", "r": "image_03"}[args.side]
    lines = []
    for date in sorted(os.listdir(args.data_path)):
        dpath = os.path.join(args.data_path, date)
        if not os.path.isdir(dpath):
            continue
        for drive in sorted(os.listdir(dpath)):
            img_dir = os.path.join(dpath, drive, cam, "data")
            if not os.path.isdir(img_dir):
                continue
            frames = sorted(os.listdir(img_dir))
            # skip first/last so [-1, +1] neighbors exist
            for f in frames[1:-1]:
                idx = int(os.path.splitext(f)[0])
                lines.append(f"{date}/{drive} {idx} {args.side}")

    rng = random.Random(args.seed)
    rng.shuffle(lines)
    n_val = int(len(lines) * args.val_frac)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "train_files.txt"), "w") as f:
        f.write("\n".join(sorted(lines[n_val:])) + "\n")
    with open(os.path.join(args.out_dir, "val_files.txt"), "w") as f:
        f.write("\n".join(sorted(lines[:n_val])) + "\n")
    print(f"{len(lines) - n_val} train / {n_val} val → {args.out_dir}")


if __name__ == "__main__":
    main()
