"""Segmentation subsystem tests: labels, metrics, transforms, model."""

import jax
import numpy as np

from tripled_tpu.config import ModelConfig
from tripled_tpu.data import seg_transforms as ST
from tripled_tpu.data.cityscapes_labels import (
    VOID_TRAIN_ID,
    gettrainid2label,
    id_to_trainid_lut,
    num_train_classes,
)
from tripled_tpu.eval.segmentation_metrics import SegmentationRunningScore
from tripled_tpu.models.segmentation import build_segmentation_model


def test_label_table():
    lut = id_to_trainid_lut()
    assert lut[7] == 0  # road
    assert lut[26] == 13  # car
    assert lut[0] == VOID_TRAIN_ID
    assert num_train_classes() == 20
    assert len(gettrainid2label()) == 20


def test_running_score_perfect_and_off():
    score = SegmentationRunningScore(3)
    gt = np.array([[0, 1, 2, 0]])
    score.update(gt[None], gt[None])
    m = score.get_scores()
    assert abs(m["meaniou"] - 1.0) < 1e-9
    score.reset()
    pred = np.array([[0, 1, 1, 0]])
    score.update(gt[None], pred[None])
    m = score.get_scores()
    assert m["meaniou"] < 1.0
    assert 0 < m["totalacc"] < 1.0


def test_transform_pipeline(rng_np):
    img = rng_np.rand(64, 96, 3).astype(np.float32)
    label = rng_np.randint(0, 34, (64, 96)).astype(np.int32)
    tf = ST.Compose(
        [
            ST.RandomHorizontalFlip(1.0),
            ST.Resize((32, 48)),
            ST.ConvertSegmentation(),
            ST.ColorJitter(fraction=1.0),
            ST.NormalizeZeroMean(),
        ]
    )
    s = tf({"image": img, "label": label}, rng_np)
    assert s["image"].shape == (32, 48, 3)
    assert s["label"].shape == (32, 48)
    assert s["label"].max() <= VOID_TRAIN_ID


def test_segmentation_model_train_eval(rng_np):
    cfg = ModelConfig(depth_num_layers=18, height=64, width=96)
    model = build_segmentation_model(cfg, "FixSegmentationDepth", num_classes=20)
    batch = {
        "image": np.asarray(rng_np.rand(2, 64, 96, 3), np.float32),
        "label": rng_np.randint(0, 20, (2, 64, 96)).astype(np.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True)
    (out, loss_dict), _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"]
    )
    assert np.isfinite(float(loss_dict["seg_ce_loss"]))
    log_probs = model.apply(variables, {"image": batch["image"]}, train=False)
    assert log_probs.shape == (2, 64, 96, 20)
    probs = np.exp(np.asarray(log_probs))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
