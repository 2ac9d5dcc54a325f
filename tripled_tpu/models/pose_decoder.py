"""6-DoF pose decoder (`mono/model/mono_fm/pose_decoder.py:5-26`):
1×1 reduce → two 3×3 convs → 1×1 to 6 ch → spatial mean → ×0.01 →
(axisangle (B,1,1,3), translation (B,1,1,3))."""

from __future__ import annotations

from flax import linen as nn

from tripled_tpu.models.layers import torch_conv_bias, torch_conv_kernel


class PoseDecoder(nn.Module):
    # torch Conv2d default init (the reference does not re-init this
    # module — see layers.torch_conv_kernel note)
    @nn.compact
    def __call__(self, bottom_feature):
        def conv(ch, k, x, pad=None):
            return nn.Conv(
                ch,
                (k, k),
                padding=pad if pad is not None else "VALID" if k == 1 else None,
                use_bias=True,
                kernel_init=torch_conv_kernel,
                bias_init=torch_conv_bias(k * k * x.shape[-1]),
            )(x)

        x = nn.relu(conv(256, 1, bottom_feature))
        x = nn.relu(conv(256, 3, x, pad=[(1, 1), (1, 1)]))
        x = nn.relu(conv(256, 3, x, pad=[(1, 1), (1, 1)]))
        x = conv(6, 1, x)
        x = x.mean(axis=(1, 2)) * 0.01  # (B, 6)
        out = x.reshape(-1, 1, 1, 6)
        return out[..., :3], out[..., 3:]
