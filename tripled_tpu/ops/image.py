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


def _linear_matrix_align_corners(n_in: int, n_out: int, dtype) -> jnp.ndarray:
    """(n_out, n_in) interpolation matrix for align_corners=True bilinear:
    output i samples input at i*(n_in-1)/(n_out-1)."""
    if n_out == 1 or n_in == 1:
        pos = jnp.zeros((n_out,), jnp.float32)
    else:
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos), 0, n_in - 1).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, lo].add(1.0 - frac)
    m = m.at[rows, hi].add(frac)
    return m.astype(dtype)


def resize_bilinear_align_corners(
    x: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """≙ F.interpolate(mode="bilinear", align_corners=True) — the HRNet fuse
    upsample (`diffnet_encoder.py:277-282`). Implemented as two small
    matmuls (separable), which XLA maps onto the MXU."""
    b, h, w, c = x.shape
    if h == height and w == width:
        return x
    mh = _linear_matrix_align_corners(h, height, x.dtype)
    mw = _linear_matrix_align_corners(w, width, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


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
