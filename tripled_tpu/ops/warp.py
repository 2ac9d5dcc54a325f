"""Bilinear / nearest backward warping (grid_sample) for NHWC images.

TPU-native replacement for the reference's `F.grid_sample(img, pix_coords,
padding_mode="border")` hot op (`mono/model/mono_fm_joint/net.py:193,222`).

Design notes:
- operates on *pixel-space* coordinates (x in [0, W-1], y in [0, H-1]); the
  reference normalizes to [-1, 1] with a (W-1, H-1) denominator which, under
  grid_sample's align_corners=True convention, round-trips back to exactly
  these pixel coordinates. A `normalized` entry point is provided for parity
  with both align_corners conventions.
- border padding == clamping the sample location into the valid rectangle.
- implemented as one flattened gather of the 4 corner texels; XLA lowers
  this to a dynamic-gather which keeps the op fused-friendly. A Pallas
  kernel (ops/pallas) specializes the fused warp+photometric-loss path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_flat(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img_flat: (B, H*W, C); idx: (B, N) int32 -> (B, N, C)."""
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1)


def grid_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Backward-warp `img` at pixel coordinates `coords` with border padding.

    Args:
      img: (B, H, W, C) source image.
      coords: (B, Ho, Wo, 2) pixel-space sample locations (x, y).
      method: "bilinear" or "nearest".

    Returns:
      (B, Ho, Wo, C) sampled image.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    x = coords[..., 0].reshape(b, -1)
    y = coords[..., 1].reshape(b, -1)

    img_flat = img.reshape(b, h * w, c)

    if method == "nearest":
        # torch grid_sample nearest: round-half-away-from-floor via floor(x+0.5)
        xi = jnp.clip(jnp.floor(x + 0.5), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y + 0.5), 0, h - 1).astype(jnp.int32)
        out = _gather_flat(img_flat, yi * w + xi)
        return out.reshape(b, ho, wo, c)

    # border padding: clamp sample position into the valid rectangle first
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    base0 = y0i * w
    base1 = y1i * w
    v00 = _gather_flat(img_flat, base0 + x0i)
    v01 = _gather_flat(img_flat, base0 + x1i)
    v10 = _gather_flat(img_flat, base1 + x0i)
    v11 = _gather_flat(img_flat, base1 + x1i)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy
    return out.reshape(b, ho, wo, c)


def warp_pixel_coords(
    img: jnp.ndarray,
    normalized_coords: jnp.ndarray,
    align_corners: bool = True,
    method: str = "bilinear",
) -> jnp.ndarray:
    """grid_sample taking [-1, 1]-normalized coords (torch parity entry).

    align_corners=True: -1/+1 map to the centers of the corner pixels
    (the convention the reference's `Project` normalization implies).
    align_corners=False: -1/+1 map to the outer edges of the corner pixels.
    """
    b, h, w, _ = img.shape
    g = normalized_coords
    if align_corners:
        x = (g[..., 0] + 1.0) * 0.5 * (w - 1)
        y = (g[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        x = ((g[..., 0] + 1.0) * w - 1.0) * 0.5
        y = ((g[..., 1] + 1.0) * h - 1.0) * 0.5
    return grid_sample(img, jnp.stack([x, y], axis=-1), method=method)
