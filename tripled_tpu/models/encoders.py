"""Encoders: depth, pose (2-frame), and the auxiliary feature extractor.

Parity targets: `mono/model/mono_fm_joint/depth_encoder.py:8-43`,
`mono/model/mono_fm/pose_encoder.py:52-92`,
`mono/model/mono_fm_joint/encoder.py:8-47`.
All encoders normalize inputs as (x - 0.45) / 0.225.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.models.resnet import ResNetFeatures, stage_channels


def _norm(x: jnp.ndarray) -> jnp.ndarray:
    return (x - 0.45) / 0.225


def _resnet(num_layers: int, remat: bool, in_channels: int = 3):
    """ResNetFeatures, optionally with activation rematerialization
    (gradient checkpointing) for the memory-heavy 320×1024 configs."""
    if remat:
        cls = nn.remat(ResNetFeatures, static_argnums=(3,))
        return cls(num_layers, in_channels=in_channels)
    return ResNetFeatures(num_layers, in_channels=in_channels)


class DepthEncoder(nn.Module):
    """ResNet feature-pyramid encoder for the depth net."""

    num_layers: int = 18
    remat: bool = False

    @property
    def num_ch_enc(self):
        return stage_channels(self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _resnet(self.num_layers, self.remat)(_norm(x), None, train)


class PoseEncoder(nn.Module):
    """ResNet encoder over `num_input_images` channel-concatenated frames."""

    num_layers: int = 18
    num_input_images: int = 2
    remat: bool = False

    @property
    def num_ch_enc(self):
        return stage_channels(self.num_layers)

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _resnet(
            self.num_layers, self.remat, in_channels=3 * self.num_input_images
        )(_norm(x), None, train)


class Extractor(nn.Module):
    """The joint autoencoder's encoder (`encoder.py:8-47`); optional additive
    per-stage conditioning features. NOTE: unlike DepthEncoder, the reference
    feeds this *unnormalized* [0,1] images (`mono_fm_joint/net.py:53`)."""

    num_layers: int = 50
    remat: bool = False

    @property
    def num_ch_enc(self):
        return stage_channels(self.num_layers)

    @nn.compact
    def __call__(
        self,
        x,
        cond_features: Sequence[jnp.ndarray] | None = None,
        train: bool = True,
    ):
        return _resnet(self.num_layers, self.remat)(x, cond_features, train)
