"""Single-image metric-depth inference (`scripts/infer.py` equivalent).

Usage:
  python -m tripled_tpu.cli.infer --config ... --checkpoint ... \
      --image img.png --out_dir out/ [--height 320 --width 1024]
"""

from __future__ import annotations

import argparse
import os

STEREO_SCALE_FACTOR = 36.0


def load_depth_model(config_path: str, checkpoint_path: str):
    import jax

    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from tripled_tpu.config import load_config
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train import checkpoint as ckpt
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_predict_fn
    from tripled_tpu.utils.inputs import dummy_train_inputs

    cfg = load_config(config_path)
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, steps_per_epoch=1)
    init_inputs = jax.device_put(dummy_train_inputs(cfg.model, batch=1))
    state = create_train_state(model, tx, init_inputs, seed=0)
    state, _ = ckpt.restore_checkpoint(checkpoint_path, state)
    return cfg, state, make_predict_fn(model)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--out_dir", default="infer_out")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=1024)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    cfg, state, predict = load_depth_model(args.config, args.checkpoint)

    img = Image.open(args.image).convert("RGB")
    ow, oh = img.size
    x = np.asarray(
        img.resize((args.width, args.height), Image.BILINEAR), np.float32
    )[None, None] / 255.0
    scaled_disp = np.asarray(predict(state.variables, x))[0, ..., 0]

    # resize back to original and convert to metric depth with the stereo
    # scale factor (scripts/infer.py:41-46)
    disp_img = Image.fromarray(scaled_disp.astype(np.float32), mode="F").resize(
        (ow, oh), Image.BILINEAR
    )
    depth = STEREO_SCALE_FACTOR / np.asarray(disp_img)

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.image))[0]
    np.save(os.path.join(args.out_dir, f"{stem}_depth.npy"), depth)
    _save_disp_png(
        np.asarray(disp_img), os.path.join(args.out_dir, f"{stem}_disp.png")
    )
    print("depth range: %.2f–%.2f m" % (depth.min(), depth.max()))


def _save_disp_png(disp, path):
    import numpy as np
    from PIL import Image

    vmax = np.percentile(disp, 95)
    norm = np.clip(disp / max(vmax, 1e-9), 0, 1)
    try:
        import matplotlib.cm as cm

        import matplotlib

        rgba = matplotlib.colormaps["magma"](norm)
        img = (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:
        img = (norm * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


if __name__ == "__main__":
    main()
