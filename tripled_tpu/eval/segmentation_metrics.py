"""Segmentation metrics: confusion matrix, IoU/accuracy/precision/freq-w acc.

Parity targets: `mono/core/evaluation/segmentation_metrics.py:27-141`
(`Evaluator` statics + `SegmentationRunningScore`)."""

from __future__ import annotations

import numpy as np


class Evaluator:
    @staticmethod
    def iou(conf):
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(conf) / (
                conf.sum(axis=1) + conf.sum(axis=0) - np.diag(conf)
            )
        return {"iou": dict(enumerate(iu)), "meaniou": np.nanmean(iu)}

    @staticmethod
    def accuracy(conf):
        with np.errstate(divide="ignore", invalid="ignore"):
            totalacc = np.diag(conf).sum() / conf.sum()
            acc = np.diag(conf) / conf.sum(axis=1)
        return {"totalacc": totalacc, "meanacc": np.nanmean(acc), "acc": acc}

    @staticmethod
    def precision(conf):
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.diag(conf) / conf.sum(axis=0)
        return {"meanprec": np.nanmean(prec), "prec": prec}

    @staticmethod
    def freqwacc(conf):
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(conf) / (
                conf.sum(axis=1) + conf.sum(axis=0) - np.diag(conf)
            )
            freq = conf.sum(axis=1) / conf.sum()
        return {"freqwacc": (freq[freq > 0] * iu[freq > 0]).sum()}


class SegmentationRunningScore:
    def __init__(self, n_classes: int = 20):
        self.n_classes = n_classes
        self.confusion_matrix = np.zeros((n_classes, n_classes))

    def _fast_hist(self, label_true, label_pred):
        n = self.n_classes
        mask = (label_true >= 0) & (label_true < n)
        hist = np.bincount(
            n * label_true[mask].astype(int) + label_pred[mask].astype(int),
            minlength=n * n,
        ).reshape(n, n)
        return hist

    def update(self, label_trues, label_preds):
        for lt, lp in zip(
            np.asarray(label_trues).reshape(-1, *np.asarray(label_trues).shape[-2:]),
            np.asarray(label_preds).reshape(-1, *np.asarray(label_preds).shape[-2:]),
        ):
            self.confusion_matrix += self._fast_hist(lt.ravel(), lp.ravel())

    def get_scores(self) -> dict:
        conf = self.confusion_matrix
        out = {}
        out.update(Evaluator.iou(conf))
        out.update(Evaluator.accuracy(conf))
        out.update(Evaluator.precision(conf))
        out.update(Evaluator.freqwacc(conf))
        return out

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))
