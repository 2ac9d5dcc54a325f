"""ResNet-18/34/50/101 five-stage feature extractor (flax.linen, NHWC).

TPU-native re-implementation of the torchvision-style encoder the reference
vendors per model dir (`mono/model/mono_fm_joint/resnet.py:1-184`). Returns
the 5-stage feature pyramid [relu1, layer1, layer2, layer3, layer4] at
strides [2, 4, 8, 16, 32] like `DepthEncoder.forward`
(`mono/model/mono_fm_joint/depth_encoder.py:34-43`).

Supports:
- `in_channels` > 3 for the pose net's concatenated frame pair
  (`mono/model/mono_fm/pose_encoder.py:11-29`),
- additive per-stage conditioning features (`mono/model/mono_fm_joint/encoder.py:36-47`),
- optional channel-narrowing of stages for disentangled encoders.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.models.layers import kaiming_out

BLOCK_COUNTS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def stage_channels(num_layers: int) -> tuple[int, ...]:
    """Output channels of the 5 extracted stages."""
    base = (64, 64, 128, 256, 512)
    if num_layers > 34:
        return (64, 256, 512, 1024, 2048)
    return base


def _bn(x, train: bool):
    # dtype=x.dtype keeps the bf16 activation chain unbroken under the
    # mixed-precision path (stats are still computed in f32 — flax
    # _compute_stats force_float32_reductions)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=x.dtype
    )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    use_residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=kaiming_out,
        )(x)
        out = _bn(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=kaiming_out,
        )(out)
        out = _bn(out, train)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=kaiming_out,
            )(x)
            residual = _bn(residual, train)
        if self.use_residual:
            out = out + residual
        return nn.relu(out)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=kaiming_out)(x)
        out = nn.relu(_bn(out, train))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=kaiming_out,
        )(out)
        out = nn.relu(_bn(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=kaiming_out)(out)
        out = _bn(out, train)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=kaiming_out,
            )(x)
            residual = _bn(residual, train)
        return nn.relu(out + residual)


class ResNetFeatures(nn.Module):
    """Five-stage ResNet feature pyramid.

    Attributes:
      num_layers: 18 / 34 / 50 / 101.
      in_channels: input channels (3, or 6 for the 2-frame pose encoder).
    """

    num_layers: int = 18
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, cond_features: Sequence[jnp.ndarray] | None = None,
                 train: bool = True):
        blocks = BLOCK_COUNTS[self.num_layers]
        bottleneck = self.num_layers > 34
        cond = list(cond_features) if cond_features is not None else [0] * 5

        feats = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=kaiming_out,
        )(x)
        x = nn.relu(_bn(x, train)) + cond[0]
        feats.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage_idx, n_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                first = b == 0
                s = stride if first else 1
                expansion = 4 if bottleneck else 1
                needs_ds = first and (s != 1 or x.shape[-1] != planes * expansion)
                if bottleneck:
                    x = Bottleneck(planes, s, downsample=needs_ds)(x, train=train)
                else:
                    x = BasicBlock(planes, s, downsample=needs_ds)(x, train=train)
            x = x + cond[stage_idx + 1]
            feats.append(x)
            planes *= 2
        return feats
