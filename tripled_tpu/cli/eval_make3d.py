"""Make3D evaluation CLI (`scripts/eval_make3D.py` equivalent).

Usage:
  python -m tripled_tpu.cli.eval_make3d --config ... --checkpoint ... \
      --make3d_path /data/make3d
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--make3d_path", required=True)
    args = p.parse_args()

    from tripled_tpu.cli.infer import load_depth_model
    from tripled_tpu.eval.make3d import evaluate_make3d

    cfg, state, predict = load_depth_model(args.config, args.checkpoint)

    def predict_disp(x):
        return predict(state.variables, x[:, None])

    errors = evaluate_make3d(predict_disp, args.make3d_path)
    print(("{:>8} | " * 4).format("abs_rel", "sq_rel", "rmse", "log10"))
    print(("{: 8.3f} , " * 4).format(*errors.tolist()))


if __name__ == "__main__":
    main()
