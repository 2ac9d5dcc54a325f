"""Segmentation models over depth-pretrained encoders.

The reference *references* three segmentation models (`BaseSegmentationDepth`,
`BaseSegmentationFeat`, `FixSegmentationDepth` — `mono/model/__init__.py:9-10`,
`mono/model/registry.py:42`, `scripts/eval_segmentation.py:33`) but the
`segmentation_base/` package is missing from the repo, so the feature ships
broken (SURVEY top-level facts). This is a working TPU-native equivalent:

- `SegmentationNet(encoder_source='depth')` ≙ BaseSegmentationDepth: the
  depth ResNet encoder + a lightweight refine decoder + per-pixel
  log-softmax over `num_classes`.
- `encoder_source='feat'` ≙ BaseSegmentationFeat: the extractor encoder.
- `freeze_encoder=True` ≙ FixSegmentationDepth: encoder frozen (probe).

Train call returns (logits, {'seg_ce_loss': ...}) with void-class-ignored
cross-entropy; eval returns per-pixel log-probabilities upsampled to input
resolution (matching eval_segmentation.py's `result.exp().argmax(1)` usage).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.config import ModelConfig
from tripled_tpu.data.cityscapes_labels import VOID_TRAIN_ID
from tripled_tpu.models.encoders import DepthEncoder, Extractor
from tripled_tpu.models.layers import Conv1x1, Conv3x3, ConvBlock
from tripled_tpu.ops.image import resize_bilinear, upsample2x_nearest


class SegDecoder(nn.Module):
    num_classes: int = 20

    @nn.compact
    def __call__(self, features):
        l0, l1, l2, l3, l4 = features
        x = Conv1x1(256)(l4)
        for skip in (l3, l2, l1):
            x = upsample2x_nearest(ConvBlock(skip.shape[-1])(x))
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(min(x.shape[-1], 256))(x)
        x = upsample2x_nearest(x)
        x = ConvBlock(64)(x)
        return Conv3x3(self.num_classes)(x)  # logits at stride 2


class SegmentationNet(nn.Module):
    cfg: ModelConfig
    num_classes: int = 20
    encoder_source: str = "depth"  # 'depth' | 'feat'
    freeze_encoder: bool = False

    def setup(self):
        if self.encoder_source == "feat":
            self.encoder = Extractor(self.cfg.extractor_num_layers)
        else:
            self.encoder = DepthEncoder(self.cfg.depth_num_layers)
        self.decoder = SegDecoder(self.num_classes)

    def __call__(self, batch: Dict[str, Any], train: bool = True):
        feats = self.encoder(batch["image"], train=train)
        if self.freeze_encoder:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        logits = self.decoder(feats)
        h, w = batch["image"].shape[1:3]
        logits = resize_bilinear(logits, h, w)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        if not train:
            return log_probs
        labels = batch["label"]
        valid = labels != VOID_TRAIN_ID
        onehot_ll = jnp.take_along_axis(
            log_probs, labels[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        ce = -(onehot_ll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"log_probs": log_probs}, {"seg_ce_loss": ce}


SEGMENTATION = {
    "BaseSegmentationDepth": dict(encoder_source="depth", freeze_encoder=False),
    "BaseSegmentationFeat": dict(encoder_source="feat", freeze_encoder=False),
    "FixSegmentationDepth": dict(encoder_source="depth", freeze_encoder=True),
}


def build_segmentation_model(
    cfg: ModelConfig, name: str = "FixSegmentationDepth", num_classes: int = 20
) -> SegmentationNet:
    if name not in SEGMENTATION:
        raise KeyError(f"unknown segmentation model '{name}': {sorted(SEGMENTATION)}")
    return SegmentationNet(cfg, num_classes=num_classes, **SEGMENTATION[name])
