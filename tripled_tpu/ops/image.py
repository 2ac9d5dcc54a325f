"""Image resizing helpers matching the reference's F.interpolate modes.

All functions take NHWC tensors. Parity targets:
- `resize_bilinear` ≙ F.interpolate(mode="bilinear", align_corners=False)
  (half-pixel centers, no antialias) — used for disp/img rescaling in losses.
- `resize_area` ≙ F.interpolate(mode="area") — adaptive average pooling; for
  integer downscale factors this is an exact box average, which is the only
  case the reference hits (img → 2^-s pyramid levels).
- `upsample2x_nearest` ≙ F.interpolate(scale_factor=2, mode="nearest") — the
  decoder upsample (`layers.py:110-111`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    if x.shape[1] == height and x.shape[2] == width:
        return x
    return jax.image.resize(
        x, (x.shape[0], height, width, x.shape[3]), method="bilinear", antialias=False
    )


def resize_nearest(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    if x.shape[1] == height and x.shape[2] == width:
        return x
    return jax.image.resize(
        x, (x.shape[0], height, width, x.shape[3]), method="nearest"
    )


def resize_area(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    if h == height and w == width:
        return x
    if h % height == 0 and w % width == 0:
        fh, fw = h // height, w // width
        return x.reshape(b, height, fh, width, fw, c).mean(axis=(2, 4))
    # non-integer factor: fall back to antialiased linear (area-equivalent)
    return jax.image.resize(
        x, (b, height, width, c), method="linear", antialias=True
    )


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
