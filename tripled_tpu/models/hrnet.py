"""HRNet multi-resolution encoder (flax, NHWC) for the DIFFNet depth path.

Clean-room HRNet-W18/32/48/64 following the published architecture (the
reference vendors a torch copy in `mono/model/mono_fm_joint/diffnet_encoder.py:57-586`):
stem (2× stride-2 conv) → 4-block Bottleneck layer1 → progressively widened
parallel branches with repeated multi-scale fusion. Returns the DIFFNet
5-feature pyramid [stem64 (s2), b0 (s4), b1 (s8), b2 (s16), b3 (s32)], i.e.
num_ch_enc = [64, W, 2W, 4W, 8W].
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from tripled_tpu.models.layers import kaiming_out
from tripled_tpu.models.resnet import BasicBlock, Bottleneck
from tripled_tpu.ops.image import resize_nearest

# (num_modules per stage2..4) for each width — standard HRNet configs
_STAGE_MODULES = {2: 1, 3: 4, 4: 3}
_BLOCKS_PER_BRANCH = 4


def _bn(x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)


class _FuseLayer(nn.Module):
    """Multi-scale fusion: every branch receives every other branch resampled
    to its resolution (1×1 conv + upsample, or strided 3×3 chain down)."""

    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = True):
        n = len(xs)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:
                    # upsample: 1x1 conv to target width then nearest resize
                    y = nn.Conv(self.out_channels[i], (1, 1), use_bias=False,
                                kernel_init=kaiming_out)(y)
                    y = _bn(y, train)
                    y = resize_nearest(y, xs[i].shape[1], xs[i].shape[2])
                elif j < i:
                    for k in range(i - j):
                        last = k == i - j - 1
                        width = self.out_channels[i] if last else y.shape[-1]
                        y = nn.Conv(
                            width, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=kaiming_out,
                        )(y)
                        y = _bn(y, train)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class _HRModule(nn.Module):
    widths: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = True):
        ys = []
        for x, w in zip(xs, self.widths):
            for _ in range(_BLOCKS_PER_BRANCH):
                x = BasicBlock(w, downsample=(x.shape[-1] != w))(x, train=train)
            ys.append(x)
        if len(ys) == 1:
            return ys
        return _FuseLayer(self.widths)(ys, train=train)


class HRNetFeatures(nn.Module):
    width: int = 18  # hrnet18/32/48/64

    @property
    def num_ch_enc(self):
        w = self.width
        return (64, w, 2 * w, 4 * w, 8 * w)

    @nn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        feats = []
        # stem
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_out)(x)
        x = nn.relu(_bn(x, train))
        feats.append(x)  # stride 2, 64ch
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_out)(x)
        x = nn.relu(_bn(x, train))

        # layer1: 4 bottlenecks at width 64 (expansion 4 → 256ch)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0))(x, train=train)

        # transitions + stages
        branches = [x]
        for stage in (2, 3, 4):
            widths = [w * (2**i) for i in range(stage)]
            new_branches = []
            for i, tw in enumerate(widths):
                if i < len(branches):
                    y = branches[i]
                    if y.shape[-1] != tw:
                        y = nn.Conv(tw, (3, 3), padding=[(1, 1), (1, 1)],
                                    use_bias=False, kernel_init=kaiming_out)(y)
                        y = nn.relu(_bn(y, train))
                else:
                    y = nn.Conv(tw, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)], use_bias=False,
                                kernel_init=kaiming_out)(branches[-1])
                    y = nn.relu(_bn(y, train))
                new_branches.append(y)
            branches = new_branches
            for _ in range(_STAGE_MODULES[stage]):
                branches = _HRModule(tuple(widths))(branches, train=train)

        feats.extend(branches)  # strides 4, 8, 16, 32
        return feats
