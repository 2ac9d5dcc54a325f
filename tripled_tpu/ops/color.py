"""Differentiable color-space conversions (RGB ↔ Lab, grayscale).

Used by the colorization / grayscale-distillation auxiliary heads. Parity
targets: `mono/model/mono_fm_joint_inpaint/color_conversions.py:6-124` and
`rgb_to_l` (`mono_fm_joint_inpaint/net.py:190-205`). NHWC layout, RGB in
[0, 1]; Lab is normalized with (l_cent=50, l_norm=50, ab_norm=110) like the
reference's colorization branch.
"""

from __future__ import annotations

import jax.numpy as jnp

_WHITE = (0.95047, 1.0, 1.08883)

# Rec.601 luma weights used by torchvision.transforms.Grayscale
_GRAY_W = (0.299, 0.587, 0.114)


def _srgb_to_linear(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)


def _linear_to_srgb(rgb: jnp.ndarray) -> jnp.ndarray:
    rgb = jnp.maximum(rgb, 0.0)
    return jnp.where(
        rgb > 0.0031308, 1.055 * rgb ** (1.0 / 2.4) - 0.055, 12.92 * rgb
    )


def rgb2xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    lin = _srgb_to_linear(rgb)
    m = jnp.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        rgb.dtype,
    )
    return jnp.einsum("bhwc,dc->bhwd", lin, m)


def xyz2rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    m = jnp.array(
        [
            [3.24048134, -1.53715152, -0.49853633],
            [-0.96925495, 1.87599, 0.04155593],
            [0.05564664, -0.20404134, 1.05731107],
        ],
        xyz.dtype,
    )
    lin = jnp.einsum("bhwc,dc->bhwd", xyz, m)
    return _linear_to_srgb(lin)


def _f_cbrt(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > 0.008856, jnp.cbrt(jnp.maximum(t, 1e-12)), 7.787 * t + 16.0 / 116.0)


def xyz2lab(xyz: jnp.ndarray) -> jnp.ndarray:
    sc = jnp.array(_WHITE, xyz.dtype)
    t = _f_cbrt(xyz / sc)
    L = 116.0 * t[..., 1] - 16.0
    a = 500.0 * (t[..., 0] - t[..., 1])
    b = 200.0 * (t[..., 1] - t[..., 2])
    return jnp.stack([L, a, b], axis=-1)


def lab2xyz(lab: jnp.ndarray) -> jnp.ndarray:
    y = (lab[..., 0] + 16.0) / 116.0
    x = lab[..., 1] / 500.0 + y
    z = jnp.maximum(y - lab[..., 2] / 200.0, 0.0)
    t = jnp.stack([x, y, z], axis=-1)
    t = jnp.where(t > 0.2068966, t**3, (t - 16.0 / 116.0) / 7.787)
    return t * jnp.array(_WHITE, lab.dtype)


def rgb2lab(
    rgb: jnp.ndarray,
    l_cent: float = 50.0,
    l_norm: float = 50.0,
    ab_norm: float = 110.0,
) -> jnp.ndarray:
    """RGB [0,1] → normalized Lab: ((L - l_cent)/l_norm, a/ab_norm, b/ab_norm)."""
    lab = xyz2lab(rgb2xyz(rgb))
    L = (lab[..., 0:1] - l_cent) / l_norm
    ab = lab[..., 1:] / ab_norm
    return jnp.concatenate([L, ab], axis=-1)


def lab2rgb(
    lab_rs: jnp.ndarray,
    l_cent: float = 50.0,
    l_norm: float = 50.0,
    ab_norm: float = 110.0,
) -> jnp.ndarray:
    L = lab_rs[..., 0:1] * l_norm + l_cent
    ab = lab_rs[..., 1:] * ab_norm
    return xyz2rgb(lab2xyz(jnp.concatenate([L, ab], axis=-1)))


def rgb_to_l(rgb: jnp.ndarray) -> jnp.ndarray:
    """L channel of Lab, scaled to [0, 1] (`net.py:190-205`)."""
    lin = _srgb_to_linear(rgb)
    y = (
        0.212671 * lin[..., 0]
        + 0.715160 * lin[..., 1]
        + 0.072169 * lin[..., 2]
    )
    yint = _f_cbrt(y)
    L = 116.0 * yint - 16.0
    return L[..., None] / 100.0


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 grayscale, matching torchvision Grayscale(num_output_channels=1)."""
    w = jnp.array(_GRAY_W, rgb.dtype)
    return jnp.einsum("bhwc,c->bhw", rgb, w)[..., None]
