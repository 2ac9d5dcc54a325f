"""In-training / offline depth evaluator (the reference's eval hooks +
`scripts/eval_depth.py` re-designed for JAX).

Instead of the reference's rank-strided loop with pickle-file gather
(`mono/core/evaluation/eval_hooks.py:195-291`), the forward pass is one
jitted batched function; only the per-image resize/crop/median-scale tail
runs on host (it is variable-shape by protocol)."""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

from tripled_tpu.eval.depth_metrics import (
    METRIC_NAMES,
    batch_post_process_disparity,
    evaluate_depth_predictions,
)


class DepthEvaluator:
    def __init__(
        self,
        predict_fn: Callable,  # (params_bundle, images (B,1,H,W,3)) -> disp (B,h,w,1)
        dataset,
        batch_size: int = 8,
        stereo_scale: bool = False,
        flip_post_process: bool = False,
    ):
        self.predict_fn = predict_fn
        self.dataset = dataset
        self.batch_size = batch_size
        self.stereo_scale = stereo_scale
        self.flip_post_process = flip_post_process

    def _collect_disps(self, variables):
        from concurrent.futures import ThreadPoolExecutor

        n = len(self.dataset)
        bs = self.batch_size
        disps = []
        n_imgs = 0
        t0 = time.perf_counter()
        rng = np.random.RandomState(0)
        pool = ThreadPoolExecutor(max_workers=4)
        for start in range(0, n, bs):
            idx = list(range(start, min(start + bs, n)))
            pad = bs - len(idx)
            samples = list(
                pool.map(lambda i: self.dataset.sample(i, rng), idx)
            )
            imgs = np.stack([s["color"] for s in samples])  # (b, 1, H, W, 3)
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            disp = np.asarray(self.predict_fn(variables, imgs))[..., 0]
            if self.flip_post_process:
                disp_f = np.asarray(
                    self.predict_fn(variables, imgs[:, :, :, ::-1])
                )[..., 0]
                disp = batch_post_process_disparity(disp, disp_f[:, :, ::-1])
            if pad:
                disp = disp[:-pad]
            disps.extend(list(disp))
            n_imgs += len(idx)
        pool.shutdown()
        dt = time.perf_counter() - t0
        fps = n_imgs / dt if dt > 0 else float("inf")
        return disps, fps

    def run(self, variables) -> dict:
        disps, fps = self._collect_disps(variables)
        gt = [self.dataset.gt_depths[i] for i in range(len(self.dataset))]
        mean_errors, ratio_med, ratio_std = evaluate_depth_predictions(
            disps, gt, stereo_scale=self.stereo_scale
        )
        metrics = dict(zip(METRIC_NAMES, [float(x) for x in mean_errors]))
        metrics["scale_ratio_med"] = float(ratio_med)
        metrics["scale_ratio_std"] = float(ratio_std)
        metrics["eval_fps"] = float(fps)
        return metrics
