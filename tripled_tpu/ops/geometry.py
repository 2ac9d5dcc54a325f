"""Camera geometry ops for self-supervised view synthesis.

Functional equivalents of the reference's `Backproject` / `Project` modules
and axis-angle pose composition (see /root/reference
`mono/model/mono_fm_joint/layers.py:41-82`, `mono/model/mono_fm_joint/net.py:225-277`),
re-designed for TPU:

- everything is pure-functional (no precomputed per-module buffers; the pixel
  grid is a compile-time constant folded by XLA),
- intrinsics are inverted in closed form (the reference calls a per-sample
  `torch.pinverse` inside the training loop — `mono_fm_joint/net.py:213-215`),
- pixel coordinates are produced in *pixel space* for the sampler, so no
  normalize/denormalize round trip is needed on device.

Layout convention: images are NHWC; depth is (B, H, W) or (B, H, W, 1);
K / T are (B, 4, 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid, shape (3, H*W): rows are x, y, 1."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x, y = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    ones = jnp.ones((height * width,), dtype)
    return jnp.stack([x.reshape(-1), y.reshape(-1), ones], axis=0)


def backproject(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Lift a depth map to homogeneous 3-D camera points.

    Args:
      depth: (B, H, W) or (B, H, W, 1).
      inv_K: (B, 4, 4) inverse intrinsics.

    Returns:
      (B, 4, H*W) homogeneous camera-frame points.

    Reference semantics: `mono/model/mono_fm_joint/layers.py:57-61`.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    pix = pixel_grid(h, w, depth.dtype)  # (3, HW)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision="highest")  # (B, 3, HW)
    cam = cam * depth.reshape(b, 1, h * w)
    ones = jnp.ones((b, 1, h * w), depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project(
    points: jnp.ndarray,
    K: jnp.ndarray,
    T: jnp.ndarray,
    height: int,
    width: int,
    eps: float = 1e-7,
    normalized: bool = False,
) -> jnp.ndarray:
    """Project homogeneous camera points into the source view's pixel plane.

    Args:
      points: (B, 4, H*W) from `backproject`.
      K: (B, 4, 4) intrinsics; T: (B, 4, 4) cam-to-cam transform.
      normalized: if True, return coords normalized to [-1, 1] (the
        reference's grid_sample convention, `layers.py:79-81`); otherwise
        return raw pixel coordinates (what our sampler consumes).

    Returns:
      (B, H, W, 2) pixel coordinates (x, y).
    """
    P = jnp.matmul(K, T)[:, :3, :]  # (B, 3, 4)
    cam = jnp.einsum("bij,bjn->bin", P, points, precision="highest")  # (B, 3, HW)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)  # (B, 2, HW)
    b = points.shape[0]
    pix = pix.reshape(b, 2, height, width).transpose(0, 2, 3, 1)  # (B,H,W,2)
    if normalized:
        scale = jnp.array([width - 1, height - 1], pix.dtype)
        pix = (pix / scale - 0.5) * 2.0
    return pix


def warp_coords(
    depth: jnp.ndarray,
    inv_K: jnp.ndarray,
    K: jnp.ndarray,
    T: jnp.ndarray,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Fused backproject→project: target-pixel → source-pixel coordinates.

    Equivalent to `project(backproject(depth, inv_K), K, T)` but contracted
    into a single (B, 3, 3) homography-on-rays plus translation term so XLA
    emits one small matmul over the pixel grid instead of two 4×4 chains.

    Returns (B, H, W, 2) raw pixel coordinates.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    b, h, w = depth.shape
    pix = pixel_grid(h, w, depth.dtype)  # (3, HW)
    P = jnp.matmul(K, T)[:, :3, :]  # (B, 3, 4)
    # cam = P[:, :, :3] @ (invK33 @ pix) * depth + P[:, :, 3]
    M = jnp.matmul(P[:, :, :3], inv_K[:, :3, :3])  # (B, 3, 3)
    rays = jnp.einsum("bij,jn->bin", M, pix, precision="highest")  # (B, 3, HW)
    cam = rays * depth.reshape(b, 1, h * w) + P[:, :, 3:4]
    xy = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    return xy.reshape(b, 2, h, w).transpose(0, 2, 3, 1)


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Sigmoid disparity → (scaled_disp, depth). `layers.py:33-38`."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (B, 1, 3) → rotation matrix (B, 4, 4) (Rodrigues).

    Reference: `mono/model/mono_fm_joint/net.py:248-277`.
    """
    angle = jnp.linalg.norm(vec, axis=2, keepdims=True)  # (B,1,1)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[:, 0, 0]
    sa = jnp.sin(angle)[:, 0, 0]
    C = 1.0 - ca
    x = axis[:, 0, 0]
    y = axis[:, 0, 1]
    z = axis[:, 0, 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zero,
            xyC + zs, y * yC + ca, yzC - xs, zero,
            zxC - ys, yzC + xs, z * zC + ca, zero,
            zero, zero, zero, one,
        ],
        axis=-1,
    ).reshape(-1, 4, 4)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) or (B, 1, 3) translation → (B, 4, 4) matrix."""
    t = t.reshape(-1, 3)
    b = t.shape[0]
    T = jnp.tile(jnp.eye(4, dtype=t.dtype)[None], (b, 1, 1))
    return T.at[:, :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """Axis-angle + translation → SE(3) (B, 4, 4).

    `invert` composes the inverse transform for backward-in-time frames.
    Reference: `mono/model/mono_fm_joint/net.py:225-236`.
    """
    R = rot_from_axisangle(axisangle.reshape(-1, 1, 3))
    t = translation.reshape(-1, 3)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return jnp.matmul(R, T)
    return jnp.matmul(T, R)


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a 4×4 pinhole intrinsics matrix.

    K = [[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]].
    The reference computes a general per-sample `torch.pinverse` inside the
    loss (`mono_fm_joint/net.py:213-215`); for an affine K the inverse is
    analytic and free.
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv = jnp.stack(
        [
            1.0 / fx, zeros, -cx / fx, zeros,
            zeros, 1.0 / fy, -cy / fy, zeros,
            zeros, zeros, ones, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    )
    return inv.reshape(K.shape)


def scale_intrinsics(K: jnp.ndarray, sx: float, sy: float) -> jnp.ndarray:
    """Scale rows 0 (x) and 1 (y) of K, as the reference does when moving
    between pyramid scales (`mono_fm_joint/net.py:209-211`)."""
    row_scale = jnp.array([sx, sy, 1.0, 1.0], K.dtype).reshape(
        (1,) * (K.ndim - 2) + (4, 1)
    )
    return K * row_scale
