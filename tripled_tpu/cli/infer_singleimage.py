"""Dump magma disparity maps over a split (`scripts/infer_singleimage.py`).

Usage:
  python -m tripled_tpu.cli.infer_singleimage --config ... --checkpoint ... \
      --out_dir vis/ [--limit N]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out_dir", default="vis")
    p.add_argument("--split_file", default=None)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    import numpy as np

    from tripled_tpu.cli.infer import _save_disp_png, load_depth_model
    from tripled_tpu.data.get_dataset import get_dataset
    from PIL import Image

    cfg, state, predict = load_depth_model(args.config, args.checkpoint)
    dataset = get_dataset(cfg.data, training=False, split_file=args.split_file)
    os.makedirs(args.out_dir, exist_ok=True)

    n = len(dataset) if not args.limit else min(args.limit, len(dataset))
    rng = np.random.RandomState(0)
    for i in range(n):
        s = dataset.sample(i, rng)
        disp = np.asarray(predict(state.variables, s["color"][None]))[0, ..., 0]
        _save_disp_png(disp, os.path.join(args.out_dir, f"{i:05d}_disp.png"))
        Image.fromarray((s["color"][0] * 255).astype(np.uint8)).save(
            os.path.join(args.out_dir, f"{i:05d}_img.png")
        )
    print(f"wrote {n} disparity maps to {args.out_dir}")


if __name__ == "__main__":
    main()
