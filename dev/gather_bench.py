"""Micro-benchmark TPU gather strategies for the bilinear warp hot op.

Times each variant with a forced readback. Shapes mirror the mono_fm bench:
B=48, H=192, W=640 source, full-res sample grid.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 48, 192, 640
N = H * W


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).block_until_ready())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    s = jnp.sum(out[0] if isinstance(out, tuple) else out)
    float(s)  # forced readback
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    x = jnp.asarray((rng.rand(B, N) * (W - 1)).astype(np.float32))
    y = jnp.asarray((rng.rand(B, N) * (H - 1)).astype(np.float32))

    def idx_parts(x, y):
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        return x0i, y0i, (x - x0)[..., None], (y - y0)[..., None]

    def gflat(flat, idx):
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    # (a) 4 separate corner gathers C=3 (round-2 baseline)
    def four_corner(img, x, y):
        x0i, y0i, wx, wy = idx_parts(x, y)
        x1i = jnp.minimum(x0i + 1, W - 1)
        y1i = jnp.minimum(y0i + 1, H - 1)
        flat = img.reshape(B, N, 3)
        v00 = gflat(flat, y0i * W + x0i)
        v01 = gflat(flat, y0i * W + x1i)
        v10 = gflat(flat, y1i * W + x0i)
        v11 = gflat(flat, y1i * W + x1i)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    def make_patches(img):
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        dright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
        return jnp.concatenate([img, right, down, dright], axis=-1)

    # (b) one 12-ch patch gather, operand fused (current warp.py)
    def patch_fused(img, x, y):
        x0i, y0i, wx, wy = idx_parts(x, y)
        p = make_patches(img).reshape(B, N, 12)
        g = gflat(p, y0i * W + x0i)
        v00, v01, v10, v11 = (g[..., i * 3 : (i + 1) * 3] for i in range(4))
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    # (c) same but patch tensor materialized behind a barrier
    def patch_barrier(img, x, y):
        x0i, y0i, wx, wy = idx_parts(x, y)
        p = jax.lax.optimization_barrier(make_patches(img)).reshape(B, N, 12)
        g = gflat(p, y0i * W + x0i)
        v00, v01, v10, v11 = (g[..., i * 3 : (i + 1) * 3] for i in range(4))
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    # (d) patch tensor padded to 128 lanes before gather
    def patch_pad128(img, x, y):
        x0i, y0i, wx, wy = idx_parts(x, y)
        p = make_patches(img).reshape(B, N, 12)
        p = jnp.pad(p, ((0, 0), (0, 0), (0, 116)))
        p = jax.lax.optimization_barrier(p)
        g = gflat(p, y0i * W + x0i)[..., :12]
        v00, v01, v10, v11 = (g[..., i * 3 : (i + 1) * 3] for i in range(4))
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    # (e) raw single gather C=3 (lower bound for one corner)
    def single_gather(img, x, y):
        x0i, y0i, _, _ = idx_parts(x, y)
        return gflat(img.reshape(B, N, 3), y0i * W + x0i)

    # (f) one-hot matmul row-gather along H then x-gather: MXU route
    #     out1[b,i,c*W+j] — too big; skipped.

    # (g) gather with indices sorted by construction? (not valid for real
    #     warps; measures whether locality matters)
    def single_gather_sorted(img, x, y):
        x0i, y0i, _, _ = idx_parts(x, y)
        idx = jnp.sort(y0i * W + x0i, axis=1)
        return gflat(img.reshape(B, N, 3), idx)

    # (h) 2D take_along_axis: gather rows then columns is invalid; instead
    #     gather on (B*N) flat with batch folded in
    def flat_batch_gather(img, x, y):
        x0i, y0i, _, _ = idx_parts(x, y)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        idx = (base + y0i * W + x0i).reshape(-1)
        flat = img.reshape(B * N, 3)
        return jnp.take(flat, idx, axis=0)

    timeit("(a) 4x corner gather C=3            ", four_corner, img, x, y)
    timeit("(b) 1x patch gather C=12 fused      ", patch_fused, img, x, y)
    timeit("(c) 1x patch gather C=12 barrier    ", patch_barrier, img, x, y)
    timeit("(d) 1x patch gather C=128 padded    ", patch_pad128, img, x, y)
    timeit("(e) 1x single gather C=3            ", single_gather, img, x, y)
    timeit("(g) 1x single gather C=3 sorted idx ", single_gather_sorted, img, x, y)
    timeit("(h) flat batch jnp.take C=3         ", flat_batch_gather, img, x, y)


if __name__ == "__main__":
    main()
