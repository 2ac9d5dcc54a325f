"""Standalone self-supervised pretext models: autoencoder, inpainter, rotnet,
and the fm_joint + rotation variant's pretext pieces.

Parity targets: `mono/model/mono_autoencoder/net.py:15-102`,
`mono/model/mono_inpainter/net.py:12-51`, `mono/model/mono_rotnet/net.py:29-59`,
`mono/model/mono_fm_joint_im_rot/net.py:10-30`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.config import ModelConfig
from tripled_tpu.models.decoders import ImageDecoder
from tripled_tpu.models.encoders import Extractor
from tripled_tpu.ops import feature_regularization_loss, reprojection_loss
from tripled_tpu.ops.image import resize_bilinear


def random_rotate_batch(rng: jax.Array, images: jnp.ndarray):
    """Per-sample rot90 by k ∈ {0,1,2,3} (square images).

    The reference permutes [0,1,2,3] labels across the batch and rotates each
    sample (`mono_rotnet/net.py:17-26`). We draw labels uniformly and select
    among the four statically-rotated copies — branch-free under jit.
    """
    b = images.shape[0]
    labels = jax.random.randint(rng, (b,), 0, 4)
    rots = jnp.stack(
        [jnp.rot90(images, k, axes=(1, 2)) for k in range(4)], axis=0
    )  # (4, B, H, W, C)
    sel = jax.nn.one_hot(labels, 4, dtype=images.dtype)  # (B, 4)
    rotated = jnp.einsum("kbhwc,bk->bhwc", rots, sel)
    return rotated, labels


def random_crop(rng: jax.Array, images: jnp.ndarray, size: int):
    """Batch-shared random crop (the reference's RandomCrop draws one offset
    per batch via torchvision on a batched tensor)."""
    b, h, w, c = images.shape
    ri = jax.random.randint(rng, (), 0, h - size + 1)
    rj = jax.random.randint(rng, (), 0, w - size + 1)
    crop = jax.lax.dynamic_slice(images, (0, ri, rj, 0), (b, size, size, c))
    return crop, (ri, rj)


def _cross_entropy_with_batch_softmax(logits, labels):
    """The reference applies F.softmax(dim=0) over the *batch* before CE
    (`mono_rotnet/net.py:57` / `im_rot/net.py:61`) — kept for parity."""
    probs = jax.nn.softmax(logits, axis=0)
    logp = jax.nn.log_softmax(probs, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


class Autoencoder(nn.Module):
    """Encoder/Decoder image reconstruction pretraining; per-stage feature
    smoothness (-dis·s1 + cvt·s2) + 4-scale SSIM+L1 reconstruction."""

    cfg: ModelConfig
    masked: bool = False  # inpainter variant

    def setup(self):
        self.encoder = Extractor(self.cfg.extractor_num_layers)
        self.decoder = ImageDecoder(3)

    def __call__(self, inputs: Dict[str, Any], train: bool = True):
        c = self.cfg
        target = inputs["color"][:, 0]
        enc_in = target * inputs["mask"] if self.masked else target
        features = self.encoder(enc_in, train=train)
        res_imgs = self.decoder(features)
        if not train:
            return res_imgs

        loss_dict = {}
        for i, f in enumerate(features):
            loss_dict[f"smooth_loss/{i}"] = (
                feature_regularization_loss(f, target, c.dis, c.cvt) / (2**i) / 5
            )
        n = len(c.scales)
        for s in c.scales:
            pred = res_imgs[s]
            h, w = pred.shape[1], pred.shape[2]
            tgt = resize_bilinear(target, h, w)
            rec = reprojection_loss(pred, tgt)
            if self.masked:
                m = resize_bilinear(inputs["mask"], h, w)
                rec = jnp.sum(rec * (1 - m)) / jnp.sum(1 - m)
            else:
                rec = rec.mean()
            loss_dict[f"min_reconstruct_loss/{s}"] = rec / n
        return {"res_imgs": res_imgs}, loss_dict


class RotNet(nn.Module):
    """Rotation-prediction pretext: encoder + linear head over 4 classes."""

    cfg: ModelConfig
    pretext_resize: int = 224
    pretext_label_size: int = 4
    pretext_weight: float = 1.0

    def setup(self):
        self.encoder = Extractor(self.cfg.extractor_num_layers)
        self.head = nn.Dense(self.pretext_label_size)

    def __call__(self, inputs: Dict[str, Any], train: bool = True):
        c = self.cfg
        target = inputs["color"][:, 0]
        crop, _ = random_crop(self.make_rng("crop"), target, self.pretext_resize)
        rotated, labels = random_rotate_batch(self.make_rng("rotation"), crop)
        features = self.encoder(rotated, train=train)
        logits = self.head(jnp.mean(features[-1], axis=(1, 2)))
        outputs = {"rot_predicts": logits, "rot_gt": labels}
        if not train:
            return outputs

        loss_dict = {}
        for i, f in enumerate(features):
            loss_dict[f"smooth_loss/{i}"] = (
                feature_regularization_loss(f, target, c.dis, c.cvt) / (2**i) / 5
            )
        loss_dict["ssl_rot_loss"] = (
            _cross_entropy_with_batch_softmax(logits, labels) * self.pretext_weight
        )
        return outputs, loss_dict
