"""2×2 model-comparison grids over a split (`scripts/gather_inference_imgs.py`).

Usage:
  python -m tripled_tpu.cli.gather_inference_imgs \
      --configs cfg_a.py cfg_b.py cfg_c.py \
      --checkpoints ck_a ck_b ck_c --out_dir grids/ [--limit N]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", required=True)
    p.add_argument("--checkpoints", nargs="+", required=True)
    p.add_argument("--out_dir", default="grids")
    p.add_argument("--split_file", default=None)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()
    assert len(args.configs) == len(args.checkpoints)

    import numpy as np
    from PIL import Image

    from tripled_tpu.cli.infer import load_depth_model
    from tripled_tpu.data.get_dataset import get_dataset

    models = [
        load_depth_model(c, k) for c, k in zip(args.configs, args.checkpoints)
    ]
    cfg = models[0][0]
    dataset = get_dataset(cfg.data, training=False, split_file=args.split_file)
    os.makedirs(args.out_dir, exist_ok=True)

    def magma(disp):
        vmax = np.percentile(disp, 95)
        norm = np.clip(disp / max(vmax, 1e-9), 0, 1)
        try:
            import matplotlib

            return (matplotlib.colormaps["magma"](norm)[..., :3] * 255).astype(
                np.uint8
            )
        except Exception:
            return np.stack([(norm * 255).astype(np.uint8)] * 3, -1)

    rng = np.random.RandomState(0)
    n = len(dataset) if not args.limit else min(args.limit, len(dataset))
    for i in range(n):
        s = dataset.sample(i, rng)
        tiles = [(s["color"][0] * 255).astype(np.uint8)]
        for _, state, predict in models:
            disp = np.asarray(predict(state.variables, s["color"][None]))[0, ..., 0]
            d = Image.fromarray(disp.astype(np.float32), mode="F").resize(
                (tiles[0].shape[1], tiles[0].shape[0]), Image.BILINEAR
            )
            tiles.append(magma(np.asarray(d)))
        while len(tiles) < 4:
            tiles.append(np.zeros_like(tiles[0]))
        top = np.concatenate(tiles[:2], axis=1)
        bot = np.concatenate(tiles[2:4], axis=1)
        Image.fromarray(np.concatenate([top, bot], axis=0)).save(
            os.path.join(args.out_dir, f"{i:05d}_grid.png")
        )
    print(f"wrote {n} grids to {args.out_dir}")


if __name__ == "__main__":
    main()
