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
- PERFORMANCE (round-3 profile): the TPU executes dynamic gathers at a
  fixed ~1e8 indices/sec *regardless of how many channels each index
  fetches* (measured: (48,122880) indices x 3ch = 51 ms and (48,30720)
  indices x 64ch = 15.7 ms — same per-index rate). Four separate corner
  gathers made the warp 66% of the whole mono_fm train step. The bilinear
  path therefore gathers once per output pixel from a pre-shifted 2x2
  "patch" tensor (img, right, down, down-right concatenated on channels):
  identical arithmetic and border semantics, 4x fewer indices. For wide
  channel counts the patch tensor is built pairwise (2 gathers of 2C)
  to bound the transient memory at 2x the source instead of 4x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad64_cap() -> int:
    import os

    return int(os.environ.get("TRIPLED_WARP_PAD64_CAP", 10**9))


def _gather_flat(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img_flat: (B, H*W, C); idx: (B, N) int32 -> (B, N, C).

    Folds the batch into the gathered axis and uses a single flat
    `jnp.take`: measured ~25% faster than the equivalent batched
    `take_along_axis` on TPU v5e (dev/gather_bench.py), which bottoms out
    at ~25ns/index either way — the hardware's serial gather rate."""
    b, n_rows, c = img_flat.shape
    base = (jnp.arange(b, dtype=jnp.int32) * n_rows)[:, None]
    flat = img_flat.reshape(b * n_rows, c)
    # callers construct provably in-bounds indices (coords are clamped to
    # the source rectangle first), so skip jnp.take's out-of-bounds
    # select_n — profiled at ~1.5 ms per full-res warp on v5e
    out = jax.lax.gather(
        flat,
        (base + idx).reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out.reshape(b, idx.shape[1], c)


def grid_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    method: str = "bilinear",
    gather_dtype=None,
) -> jnp.ndarray:
    """Backward-warp `img` at pixel coordinates `coords` with border padding.

    Args:
      img: (B, H, W, C) source image.
      coords: (B, Ho, Wo, 2) pixel-space sample locations (x, y).
      method: "bilinear" or "nearest".
      gather_dtype: optional dtype for the gathered corner texels (e.g.
        jnp.bfloat16 trades exactness for ~15% less gather time on v5e —
        dev/gather_bench3.py); the interpolation itself stays in the
        input dtype. None keeps the gather exact.

    Returns:
      (B, Ho, Wo, C) sampled image.
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    x = coords[..., 0].reshape(b, -1)
    y = coords[..., 1].reshape(b, -1)

    if method == "nearest":
        # torch grid_sample nearest: round-half-away-from-floor via floor(x+0.5)
        xi = jnp.clip(jnp.floor(x + 0.5), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y + 0.5), 0, h - 1).astype(jnp.int32)
        out = _gather_flat(img.reshape(b, h * w, c), yi * w + xi)
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

    # Pre-shifted corner planes. `right`/`down` clamp at the border, which
    # reproduces x1 = min(x0+1, w-1) / y1 = min(y0+1, h-1) exactly.
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    idx00 = y0i * w + x0i
    # Wide channels (33..64) only take the 4-corner path when the 4C patch
    # tensor fits the byte cap: at C=64 it is 4x the source (vs 2x for the
    # pairwise fallback), which flips memory-tight configs into OOM
    # (ADVICE r3). Narrow channels always qualify (patch <= 128 lanes).
    patch_itemsize = jnp.dtype(gather_dtype or img.dtype).itemsize
    patch4_bytes = b * h * w * 4 * c * patch_itemsize
    if c <= 32 or (c <= 64 and patch4_bytes <= _pad64_cap()):
        # one gather per output pixel fetching all 4 corners (4C channels)
        down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
        patches = jnp.concatenate([img, right, down, downright], axis=-1)
        if gather_dtype is not None:
            patches = patches.astype(gather_dtype)
        # Pad gather rows to 64 lanes: the XLA TPU gather emitter switches
        # to a ~1.6x faster strategy at 64-lane rows (measured
        # dev/gather_bench3.py: 12/16/24/32/64/128 lanes -> 144/145/194/
        # 239/91/102 ms per full-res warp). Zero-pad is sliced back off;
        # the barrier keeps the padded tensor materialized as the micro-
        # benchmarked form instead of fused into the gather. The padded
        # tensor costs 64/(4C) x the source image in HBM and stays live
        # across all scales that warp the same source (XLA CSE), so the
        # trade is only taken below a size cap (default 1 GB/frame,
        # override TRIPLED_WARP_PAD64_CAP bytes; bs48 @192x640 = 1.5 GB
        # per frame OOMs the 15.75 GB chip under the train step).
        # DO NOT fold the zero lanes into the concat as an operand: that
        # "one fused build" form re-fuses the graph into fusions that
        # re-read far more operand bytes (+45 GB cost-analysis, -20%
        # measured throughput on the bs16 headline — r5 byte ledger,
        # BASELINE.md "Negative result"). concat -> cast -> pad ->
        # barrier is the fast form.
        pc = 4 * c
        pad64_bytes = b * h * w * 64 * jnp.dtype(patches.dtype).itemsize
        if pc < 64 and pad64_bytes <= _pad64_cap():
            patches = jnp.pad(
                patches, ((0, 0), (0, 0), (0, 0), (0, 64 - pc))
            )
            patches = jax.lax.optimization_barrier(patches)
            pc = 64
        g = _gather_flat(patches.reshape(b, h * w, pc), idx00)
        if g.dtype != img.dtype:
            g = g.astype(img.dtype)
        v00 = g[..., 0 * c : 1 * c]
        v01 = g[..., 1 * c : 2 * c]
        v10 = g[..., 2 * c : 3 * c]
        v11 = g[..., 3 * c : 4 * c]
    else:
        # very wide channels: two gathers of (img, right) pairs — caps the
        # transient patch tensor at 2x the source size
        pair = jnp.concatenate([img, right], axis=-1)
        if gather_dtype is not None:
            pair = pair.astype(gather_dtype)
        pair = pair.reshape(b, h * w, 2 * c)
        y1i = jnp.minimum(y0i + 1, h - 1)
        g0 = _gather_flat(pair, idx00)
        g1 = _gather_flat(pair, y1i * w + x0i)
        if g0.dtype != img.dtype:
            g0 = g0.astype(img.dtype)
            g1 = g1.astype(img.dtype)
        v00, v01 = g0[..., :c], g0[..., c:]
        v10, v11 = g1[..., :c], g1[..., c:]

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy
    return out.reshape(b, ho, wo, c)


def grid_sample_block(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    gather_dtype=None,
    block: tuple[int, int] = (2, 2),
) -> jnp.ndarray:
    """Bilinear warp with bh*bw-fold fewer gather indices via output blocking.

    The TPU gather engine is serial in the INDEX COUNT (~10-15 ns/index,
    BASELINE.md round-3 characterization), so the lever left after the
    4-corner patch trick is issuing fewer indices. Reprojection flow is
    smooth almost everywhere: the bh*bw sample points of a block of
    output pixels nearly always land inside one (bh+2)x(bw+2) source
    patch. This path gathers ONE patch per output block (e.g. 2x2 RGB:
    4x4x3 = 48 channels zero-padded to the 64-lane fast-gather row; 2x4
    RGB: 4x6x3 = 72 -> 128 lanes at half the index count again —
    dev/gather_bench4.py / gb6) and reconstructs each pixel's bilinear
    sample from the patch with dense relu-tent weights on the VPU.

    EXACTNESS: identical to `grid_sample` wherever every sample of the
    block lands within (patch_side - 1) px of the block's min corner
    (floor(min) anchor) — in practice everything except
    depth-discontinuity pixels (<~1% on KITTI-like flow;
    tests/test_warp_block.py quantifies). Violating samples are clamped
    to the patch edge (nearest-in-patch along the offending axis). This
    is therefore an OPT-IN speed mode (ModelConfig.warp_block_gather);
    the default path stays bit-exact vs torch grid_sample.

    Requires output H % bh == 0 and W % bw == 0. Works for wide channels
    too (e.g. the 64-ch feature warp: 4x4x64 = 1024-lane patch rows, 4x
    fewer indices than even one full gather — ModelConfig.
    warp_block_features).
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    bh, bw = block
    py, px = bh + 2, bw + 2  # patch sides
    # A block wider than (2,2) is only a win when its patch rows reach the
    # next fast-gather width (128 lanes); if the byte cap refuses that pad
    # the gather would run at a slow 65..127-lane mode AND carry the wider
    # clamp tolerance — strictly worse than (2,2) (ADVICE r3). Fall back.
    if (bh, bw) != (2, 2):
        pc_w = py * px * c
        pad_to_w = 64 if pc_w <= 64 else (128 if pc_w <= 128 else pc_w)
        itemsize = jnp.dtype(gather_dtype or img.dtype).itemsize
        if pc_w < pad_to_w and b * h * w * pad_to_w * itemsize > _pad64_cap():
            return grid_sample_block(
                img, coords, gather_dtype=gather_dtype, block=(2, 2)
            )
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)

    # block anchor: floor of the block-min, clamped so the patch stays
    # in-bounds (gradient-free by construction: floor/min of clipped ints)
    xb = x.reshape(b, ho // bh, bh, wo // bw, bw)
    yb = y.reshape(b, ho // bh, bh, wo // bw, bw)
    xa = jnp.clip(
        jnp.floor(jax.lax.stop_gradient(xb).min(axis=(2, 4))), 0, w - px
    ).astype(jnp.int32)
    ya = jnp.clip(
        jnp.floor(jax.lax.stop_gradient(yb).min(axis=(2, 4))), 0, h - py
    ).astype(jnp.int32)

    # py*px pre-shifted planes, edge-replicated (border semantics: clamping
    # x0+dx at w-1 == replicating the last column, as in `grid_sample`)
    imgp = jnp.pad(img, ((0, 0), (0, py - 1), (0, px - 1), (0, 0)), mode="edge")
    planes = [
        imgp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(py)
        for dx in range(px)
    ]
    patches = jnp.concatenate(planes, axis=-1)  # (B, H, W, py*px*C)
    if gather_dtype is not None:
        patches = patches.astype(gather_dtype)
    pc = py * px * c
    # pad rows up to the next fast-gather width (64 or 128 lanes; both are
    # faster per index than the 12-56 lane modes — dev/gather_bench3.py).
    # Keep the pad a separate jnp.pad after the cast: zeros-as-concat-
    # operand measured -20% end-to-end (r5 byte ledger, BASELINE.md
    # "Negative result").
    pad_to = 64 if pc <= 64 else (128 if pc <= 128 else pc)
    padded_bytes = b * h * w * pad_to * jnp.dtype(patches.dtype).itemsize
    if pc < pad_to and padded_bytes <= _pad64_cap():
        patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 0), (0, pad_to - pc)))
        patches = jax.lax.optimization_barrier(patches)
        pc = pad_to
    g = _gather_flat(
        patches.reshape(b, h * w, pc), (ya * w + xa).reshape(b, -1)
    )[..., : py * px * c]
    if g.dtype != img.dtype:
        g = g.astype(img.dtype)
    # (B, hb, wb, dy, dx, C), broadcast over the bh*bw block positions
    g = g.reshape(b, ho // bh, 1, wo // bw, 1, py, px, c)

    # relu-tent weights; offsets clamped into the patch (the inexact case)
    rx = jnp.clip(xb - xa[:, :, None, :, None].astype(xb.dtype), 0.0, px - 1.0)
    ry = jnp.clip(yb - ya[:, :, None, :, None].astype(yb.dtype), 0.0, py - 1.0)
    dxr = jnp.arange(px, dtype=img.dtype)
    dyr = jnp.arange(py, dtype=img.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - dxr))  # (..., px)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - dyr))  # (..., py)
    # nested weighted sum, fused elementwise on the VPU: contract x then y
    out = (
        (g * wx[:, :, :, :, :, None, :, None]).sum(axis=6)
        * wy[:, :, :, :, :, :, None]
    ).sum(axis=5)
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
