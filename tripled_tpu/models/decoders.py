"""Image-reconstruction decoders.

`ImageDecoder` ≙ the autoencoder `Decoder`
(`mono/model/mono_fm_joint/decoder.py:7-57`): 5 × (ConvBlock → 2× nearest
upsample → iconv ConvBlock) fed only by the deepest encoder feature; sigmoid
image heads at 4 scales.

`ColorDecoder` (`decoder.py:60-113`): same trunk, plus per-level disparity
injection (`iconv + disp * skip_connection_multiplier`) and optional additive
encoder skip connections; emits `auto_res_img` at 4 scales.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from tripled_tpu.models.layers import Conv3x3, ConvBlock
from tripled_tpu.ops.image import resize_bilinear, upsample2x_nearest

_DEC_CH = (16, 32, 64, 128, 256)


class ImageDecoder(nn.Module):
    num_output_channels: int = 3
    num_ch_dec: Sequence[int] = _DEC_CH

    @nn.compact
    def __call__(self, features):
        x = features[4]
        ch = self.num_ch_dec
        iconvs = []
        for level in range(4, -1, -1):
            x = upsample2x_nearest(ConvBlock(ch[level])(x))
            x = ConvBlock(ch[level])(x)
            iconvs.append(x)  # iconv5..iconv1
        # heads on iconv4..iconv1 (scales 3..0)
        outs = []
        for i, level in enumerate((3, 2, 1, 0)):
            img = nn.sigmoid(Conv3x3(self.num_output_channels)(iconvs[i + 1]))
            outs.append(img)
        # outs == [scale3, scale2, scale1, scale0]; return scale0-first
        return outs[::-1]


class ColorDecoder(nn.Module):
    num_output_channels: int = 3
    skip_connection_multiplier: float = 1.0
    skip_layers: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, features, disps):
        """features: 5-stage encoder pyramid; disps: [s0, s1, s2, s3]."""
        econv1, econv2, econv3, econv4, econv5 = features
        disp1, disp2, disp3, disp4 = disps[0], disps[1], disps[2], disps[3]
        ch = _DEC_CH
        m = self.skip_connection_multiplier

        def inject(x, disp):
            d = resize_bilinear(disp, x.shape[1], x.shape[2])
            return x + d * m

        up5 = upsample2x_nearest(ConvBlock(ch[4])(econv5))
        iconv5 = inject(ConvBlock(ch[4])(up5), disp4)

        up4 = upsample2x_nearest(ConvBlock(ch[3])(iconv5))
        if self.skip_layers[0]:
            up4 = up4 + upsample2x_nearest(ConvBlock(ch[3])(econv4))
        iconv4 = inject(ConvBlock(ch[3])(up4), disp3)

        up3 = upsample2x_nearest(ConvBlock(ch[2])(iconv4))
        if self.skip_layers[1]:
            up3 = up3 + upsample2x_nearest(ConvBlock(ch[2])(econv3))
        iconv3 = inject(ConvBlock(ch[2])(up3), disp2)

        up2 = upsample2x_nearest(ConvBlock(ch[1])(iconv3))
        if self.skip_layers[2]:
            up2 = up2 + upsample2x_nearest(ConvBlock(ch[1])(econv2))
        iconv2 = inject(ConvBlock(ch[1])(up2), disp1)

        up1 = upsample2x_nearest(ConvBlock(ch[0])(iconv2))
        if self.skip_layers[3]:
            up1 = up1 + upsample2x_nearest(ConvBlock(ch[0])(econv1))
        iconv1 = ConvBlock(ch[0])(up1)

        head = lambda x: nn.sigmoid(Conv3x3(self.num_output_channels)(x))
        # [scale0, scale1, scale2, scale3] = heads on iconv1..iconv4
        return [head(iconv1), head(iconv2), head(iconv3), head(iconv4)]
