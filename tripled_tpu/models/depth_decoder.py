"""Multi-scale disparity decoders.

`DepthDecoder` is the RefineNet-style CRP decoder
(`mono/model/mono_fm_joint/depth_decoder.py:8-115`): per level a 1×1 reduce,
iconv over cat(reduce, up(prev), prev_disp), leaky-relu, CRP×4, merge conv,
2× nearest upsample (or sub-pixel shuffle), and a sigmoid disp head.
Dropout(0.5) is applied to the two deepest encoder stages at train time.

Outputs disps [scale3, scale2, scale1, scale0] at 1/16..1/2 of input res
(each head fires *after* its upsample, exactly like the reference).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.models.layers import CRPBlock, Conv1x1, Conv3x3, UpShuffle
from tripled_tpu.ops.image import upsample2x_nearest


class DepthDecoder(nn.Module):
    num_ch_enc: Sequence[int]
    bottleneck: int = 256
    use_shuffle: bool = False
    dropout_rate: float = 0.5
    eqmask_pool: bool = False

    @nn.compact
    def __call__(self, features, train: bool = True):
        l0, l1, l2, l3, l4 = features
        deterministic = not train
        do = nn.Dropout(self.dropout_rate, deterministic=deterministic)
        l4 = do(l4)
        l3 = do(l3)

        bn = self.bottleneck

        if self.use_shuffle:
            # Reference quirk kept for parity: the forward reuses `up2` for
            # level 1 (`depth_decoder.py:104-107` — `x1 = self.up2(x1)`), so
            # `up1` is dead weight. Three shuffle modules: level4, level3,
            # and level2-shared-with-level1.
            shuffles = [UpShuffle(bn, 2) for _ in range(3)]
            ups = [shuffles[0], shuffles[1], shuffles[2], shuffles[2]]
        else:
            ups = [upsample2x_nearest] * 4

        def level(feat, prev, prev_disp, reduce_ch, up):
            x = Conv1x1(reduce_ch, use_bias=False)(feat)
            if prev is not None:
                x = jnp.concatenate([x, prev, prev_disp], axis=-1)
            x = Conv3x3(bn)(x)
            x = nn.leaky_relu(x)
            x = CRPBlock(bn, 4, eqmask_pool=self.eqmask_pool)(x)
            x = Conv3x3(bn)(x)
            x = nn.leaky_relu(x)
            x = up(x)
            disp = nn.sigmoid(Conv3x3(1)(x))
            return x, disp

        x4, disp4 = level(l4, None, None, 512, ups[0])
        x3, disp3 = level(l3, x4, disp4, bn, ups[1])
        x2, disp2 = level(l2, x3, disp3, bn, ups[2])
        x1, disp1 = level(l1, x2, disp2, bn, ups[3])

        # scales [0, 1, 2, 3] == [disp1, disp2, disp3, disp4]
        return [disp1, disp2, disp3, disp4]
