"""Feature-warp gather variants (C=64 @ half-res): pairwise 2x(2C) vs a
single 4-corner (4C) gather, f32 vs bf16 texels.

Round-3 profile: _warp_features FWD is 38 ms/step at mono_fm bs16 — the
pairwise path issues 2 gathers of f32 128-lane rows per source frame.
The gather engine is serial per-index and nearly flat in row width
(BASELINE.md), so one 256-lane gather should halve it if the flat-rate
regime extends to 512B/1KB rows.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 16, 96, 320, 64
N = H * W


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    reps = 5
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn_j(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"{name:48s} {best:8.2f} ms", flush=True)
    return best


def gather_flat(flat, idx, c):
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
    out = jax.lax.gather(
        flat.reshape(B * N, c),
        (base + idx).reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        ),
        slice_sizes=(1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return out.reshape(B, idx.shape[1], c)


def lerp(v00, v01, v10, v11, wx, wy):
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x = jnp.asarray((rng.rand(B, N) * (W - 1)).astype(np.float32))
    y = jnp.asarray((rng.rand(B, N) * (H - 1)).astype(np.float32))

    def pairwise(dtype):
        def f(img, x, y):
            right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
            pair = jnp.concatenate([img, right], axis=-1).astype(dtype)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            y1 = jnp.minimum(y0 + 1, H - 1)
            wx = (x - jnp.floor(x))[..., None]
            wy = (y - jnp.floor(y))[..., None]
            g0 = gather_flat(pair, y0 * W + x0, 2 * C).astype(jnp.float32)
            g1 = gather_flat(pair, y1 * W + x0, 2 * C).astype(jnp.float32)
            return lerp(g0[..., :C], g0[..., C:], g1[..., :C], g1[..., C:], wx, wy)

        return f

    def fourcorner(dtype):
        def f(img, x, y):
            right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
            down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
            dright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
            patches = jnp.concatenate([img, right, down, dright], axis=-1).astype(dtype)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            wx = (x - jnp.floor(x))[..., None]
            wy = (y - jnp.floor(y))[..., None]
            g = gather_flat(patches, y0 * W + x0, 4 * C).astype(jnp.float32)
            return lerp(
                g[..., : C], g[..., C : 2 * C], g[..., 2 * C : 3 * C],
                g[..., 3 * C :], wx, wy,
            )

        return f

    timeit("pairwise 2x128-lane f32 (current)", pairwise(jnp.float32), img, x, y)
    timeit("pairwise 2x128-lane bf16", pairwise(jnp.bfloat16), img, x, y)
    timeit("4-corner 1x256-lane f32", fourcorner(jnp.float32), img, x, y)
    timeit("4-corner 1x256-lane bf16", fourcorner(jnp.bfloat16), img, x, y)


if __name__ == "__main__":
    main()
