"""HRNet multi-resolution encoder (flax, NHWC) for the DIFFNet depth path.

TPU-native rebuild of the torch HRNet the reference vendors
(`mono/model/mono_fm_joint/diffnet_encoder.py:57-496`): stem (2× stride-2
conv) → 4-Bottleneck layer1 → transition/stage pyramid with repeated
multi-scale fusion (fuse upsample = bilinear align_corners=True,
`diffnet_encoder.py:277-282`).

Returns the reference's nested DIFFNet feature structure
(`diffnet_encoder.py:440-496`):
  [stem_s2 (64ch),
   list18 = [conv2_s4 (64ch), stage2_y0, stage3_y0, stage4_y0],
   list36 = [stage2_y1, stage3_y1, stage4_y1],
   list72 = [stage3_y2, stage4_y2],
   stage4_y3 (8W ch, s32)]

Conv/BN creation order deliberately mirrors the torch module registration
order so `utils/torch_import.import_hrnet` can order-zip a reference
state_dict onto the flax tree (same strategy as `import_resnet`).
"""

from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from tripled_tpu.models.layers import kaiming_out
from tripled_tpu.models.resnet import BasicBlock, Bottleneck
from tripled_tpu.ops.image import resize_bilinear_align_corners

# num_modules for stages 2..4 — same for all widths (diffnet_config.py:1-159)
_STAGE_MODULES = {2: 1, 3: 4, 4: 3}
_BLOCKS_PER_BRANCH = 4


def _bn(x, train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=x.dtype
    )(x)


class _FuseLayer(nn.Module):
    """Multi-scale fusion (`HighResolutionModule._make_fuse_layers` +
    forward, `diffnet_encoder.py:214-287`): every branch i receives every
    branch j resampled to its resolution. Layer creation order matches the
    torch registration order (i outer, j inner, j==i skipped)."""

    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = True):
        n = len(xs)
        outs = []
        for i in range(n):
            acc = xs[i]
            for j in range(n):
                if j == i:
                    continue
                y = xs[j]
                if j > i:
                    # 1x1 conv + BN, then bilinear align_corners=True up
                    y = nn.Conv(self.out_channels[i], (1, 1), use_bias=False,
                                kernel_init=kaiming_out)(y)
                    y = _bn(y, train)
                    y = resize_bilinear_align_corners(
                        y, xs[i].shape[1], xs[i].shape[2]
                    )
                else:
                    # chain of stride-2 3x3 convs; ReLU on all but the last
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
                acc = acc + y
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
        return _FuseLayer(tuple(self.widths))(ys, train=train)


class HRNetFeatures(nn.Module):
    width: int = 18  # hrnet18/32/48/64

    @property
    def num_ch_enc(self):
        w = self.width
        return (64, w, 2 * w, 4 * w, 8 * w)

    @nn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        # stem
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_out)(x)
        x = nn.relu(_bn(x, train))
        stem = x  # stride 2, 64ch
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=kaiming_out)(x)
        x = nn.relu(_bn(x, train))
        list18 = [x]  # conv2 output, stride 4, 64ch (appended BEFORE layer1)

        # layer1: 4 bottlenecks at width 64 (expansion 4 → 256ch)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0))(x, train=train)

        list36, list72 = [], []
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
            list18.append(branches[0])
            list36.append(branches[1])
            if stage >= 3:
                list72.append(branches[2])

        return [stem, list18, list36, list72, branches[3]]
