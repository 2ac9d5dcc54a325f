"""SSIM photometric similarity (3×3 box filter, reflection-padded).

Reference semantics: `mono/model/mono_fm_joint/layers.py:85-107` — reflection
pad 1, 3×3 average pooling, C1=0.01², C2=0.03², output clamp((1-SSIM)/2, 0, 1)
so the result is a *dissimilarity* in [0, 1] with the same spatial shape as
the inputs.

The five 3×3 box filters are expressed as `lax.reduce_window` means on a
jointly reflection-padded stack; XLA fuses the elementwise tail into the
window reductions, so no Pallas kernel is needed for the standalone op (the
fused warp+SSIM path lives in ops/pallas).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_C1 = 0.01**2
_C2 = 0.03**2


def _box3(x: jnp.ndarray) -> jnp.ndarray:
    """3×3 mean over valid windows of an NHWC tensor (already padded)."""
    s = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """SSIM dissimilarity map clamp((1 - SSIM)/2, 0, 1), NHWC in/out."""
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _box3(xp)
    mu_y = _box3(yp)
    sigma_x = _box3(xp * xp) - mu_x * mu_x
    sigma_y = _box3(yp * yp) - mu_y * mu_y
    sigma_xy = _box3(xp * yp) - mu_x * mu_y

    n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
    d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)
