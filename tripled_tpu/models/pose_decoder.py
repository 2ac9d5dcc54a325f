"""6-DoF pose decoder (`mono/model/mono_fm/pose_decoder.py:5-26`):
1×1 reduce → two 3×3 convs → 1×1 to 6 ch → spatial mean → ×0.01 →
(axisangle (B,1,1,3), translation (B,1,1,3))."""

from __future__ import annotations

from flax import linen as nn


class PoseDecoder(nn.Module):
    @nn.compact
    def __call__(self, bottom_feature):
        x = nn.relu(nn.Conv(256, (1, 1), use_bias=True)(bottom_feature))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True)(x))
        x = nn.Conv(6, (1, 1), use_bias=True)(x)
        x = x.mean(axis=(1, 2)) * 0.01  # (B, 6)
        out = x.reshape(-1, 1, 1, 6)
        return out[..., :3], out[..., 3:]
