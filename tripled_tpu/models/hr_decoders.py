"""HR-Depth and DIFFNet disparity decoders (flax, NHWC).

Semantics ported from the reference's `mono/model/mono_fm_joint/depth_decoder.py:118-296`
(dense nested-grid HR-Depth decoder with fSE attention at positions
31/22/13/04, and the DIFFNet channel-attention decoder). Channel plumbing is
shape-inferred by flax; only output widths are specified.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.models.layers import (
    AttentionModule,
    Conv1x1,
    Conv3x3,
    ConvBlock,
    FSEModule,
)
from tripled_tpu.ops.image import upsample2x_nearest

_ALL_POSITIONS = ("01", "11", "21", "31", "02", "12", "22", "03", "13", "04")
_ATTENTION = {"31", "22", "13", "04"}


class HRDepthDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    num_output_channels: int = 1

    @nn.compact
    def __call__(self, input_features, train: bool = True):
        enc = list(self.num_ch_enc)
        dec = list(self.num_ch_dec)
        feats = {f"{i}0": f for i, f in enumerate(input_features)}

        def conv0_out(i, j):
            ch = enc[i]
            if i == 0 and j != 0:
                ch //= 2
            return max(ch // 2, 1)

        for index in _ALL_POSITIONS:
            row, col = int(index[0]), int(index[1])
            lows = [feats[f"{row}{i}"] for i in range(col)]
            src = feats[f"{row + 1}{col - 1}"]
            high = ConvBlock(conv0_out(row + 1, col - 1))(src)
            if index in _ATTENTION:
                feats[index] = FSEModule(high.shape[-1])(high, lows)
            else:
                merged = jnp.concatenate(
                    [upsample2x_nearest(high)] + lows, axis=-1
                )
                if col != 1:
                    merged = Conv1x1(dec[row + 1] * 2)(merged)
                feats[index] = ConvBlock(dec[row + 1])(merged)

        x = ConvBlock(conv0_out(0, 4))(feats["04"])
        x = ConvBlock(dec[0])(upsample2x_nearest(x))

        head = lambda t: nn.sigmoid(Conv3x3(self.num_output_channels)(t))
        return [head(x), head(feats["04"]), head(feats["13"]), head(feats["22"])]


class DIFFDepthDecoder(nn.Module):
    """DIFFNet decoder over the HRNet *nested* feature structure
    (`depth_decoder.py:243-296`): input_features =
    [stem64, list18 (4 tensors), list36 (3), list72 (2), f144]; each
    Attention_Module concatenates upsample(high) with the whole per-width
    list. Module creation order matches the torch ModuleDict insertion
    order (up_x9_0, up_x9_1, 72, 36, 18, 9, dispConvScale0..3)."""

    num_ch_enc: Sequence[int]
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    num_output_channels: int = 1

    @nn.compact
    def __call__(self, input_features, train: bool = True):
        f64, list18, list36, list72, f144 = input_features
        x72 = AttentionModule(256)(f144, list72)
        x36 = AttentionModule(128)(x72, list36)
        x18 = AttentionModule(64)(x36, list18)
        x9 = AttentionModule(32)(x18, [f64])
        # sequential statements so flax names ConvBlock_0 = up_x9_0,
        # ConvBlock_1 = up_x9_1 (construction order == torch insertion order)
        x6 = ConvBlock(self.num_ch_dec[0])(x9)
        x6 = ConvBlock(self.num_ch_dec[0])(upsample2x_nearest(x6))
        head = lambda t: nn.sigmoid(Conv3x3(self.num_output_channels)(t))
        return [head(x6), head(x9), head(x18), head(x36)]
