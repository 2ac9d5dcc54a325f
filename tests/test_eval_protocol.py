"""Eigen evaluation protocol golden test: evaluate_depth_predictions must
reproduce a direct transcription of `scripts/eval_depth.py:70-108`."""

import numpy as np
from PIL import Image

from tripled_tpu.eval.depth_metrics import (
    batch_post_process_disparity,
    compute_errors,
    evaluate_depth_predictions,
)


def _reference_eval(pred_disps, gt_depths, min_depth=1e-3, max_depth=80.0):
    errors, ratios = [], []
    for pred_disp, gt_depth in zip(pred_disps, gt_depths):
        gt_height, gt_width = gt_depth.shape[:2]
        disp = np.asarray(
            Image.fromarray(pred_disp.astype(np.float32), mode="F").resize(
                (gt_width, gt_height), Image.BILINEAR
            )
        )
        pred_depth = 1.0 / disp
        mask = np.logical_and(gt_depth > min_depth, gt_depth < max_depth)
        crop = np.array(
            [0.40810811 * gt_height, 0.99189189 * gt_height,
             0.03594771 * gt_width, 0.96405229 * gt_width]
        ).astype(np.int32)
        crop_mask = np.zeros(mask.shape)
        crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
        mask = np.logical_and(mask, crop_mask)
        p = pred_depth[mask]
        g = gt_depth[mask]
        ratio = np.median(g) / np.median(p)
        ratios.append(ratio)
        p *= ratio
        p[p < min_depth] = min_depth
        p[p > max_depth] = max_depth
        errors.append(compute_errors(g, p))
    return np.array(errors).mean(0), np.median(ratios)


def test_eval_protocol_matches_reference_transcription(rng_np):
    preds, gts = [], []
    for i in range(4):
        h, w = 96 + i * 8, 320 + i * 16
        disp = rng_np.rand(48, 160).astype(np.float32) * 0.2 + 0.02
        gt = np.zeros((h, w), np.float64)
        ys = rng_np.randint(int(0.45 * h), h - 1, 500)
        xs = rng_np.randint(int(0.05 * w), int(0.95 * w), 500)
        gt[ys, xs] = rng_np.rand(500) * 60 + 2
        preds.append(disp)
        gts.append(gt)

    got, ratio_med, _ = evaluate_depth_predictions(preds, gts)
    ref, ref_ratio = _reference_eval(preds, gts)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    np.testing.assert_allclose(ratio_med, ref_ratio, rtol=1e-6)


def test_flip_post_processing_shape(rng_np):
    l = rng_np.rand(2, 24, 32).astype(np.float32)
    r = rng_np.rand(2, 24, 32).astype(np.float32)
    out = batch_post_process_disparity(l, r)
    assert out.shape == l.shape
    # at the horizontal center the blend is the mean
    mid = out[:, :, 16]
    np.testing.assert_allclose(mid, 0.5 * (l + r)[:, :, 16], rtol=1e-5)
