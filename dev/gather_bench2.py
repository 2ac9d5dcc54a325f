"""Round 2 of gather strategy micro-bench: flat batch-folded takes of the
4-corner patch tensor, dtype variants, and slice-based lax.gather."""

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
    float(jnp.sum(out).block_until_ready())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def make_patches(img):
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    dright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return jnp.concatenate([img, right, down, dright], axis=-1)


def idx_of(x, y):
    return jnp.floor(y).astype(jnp.int32) * W + jnp.floor(x).astype(jnp.int32)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    x = jnp.asarray((rng.rand(B, N) * (W - 1)).astype(np.float32))
    y = jnp.asarray((rng.rand(B, N) * (H - 1)).astype(np.float32))

    def lerp(g, x, y):
        wx = (x - jnp.floor(x)).reshape(B, N, 1)
        wy = (y - jnp.floor(y)).reshape(B, N, 1)
        v00, v01, v10, v11 = (g[..., i * 3 : (i + 1) * 3] for i in range(4))
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    # (i) flat batch-folded take of C=12 patches
    def patch_flat_take(img, x, y):
        p = make_patches(img).reshape(B * N, 12)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        g = jnp.take(p, (base + idx_of(x, y)).reshape(-1), axis=0)
        return lerp(g.reshape(B, N, 12), x, y)

    # (j) same, patches cast to bf16 (gather half the bytes)
    def patch_flat_take_bf16(img, x, y):
        p = make_patches(img).astype(jnp.bfloat16).reshape(B * N, 12)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        g = jnp.take(p, (base + idx_of(x, y)).reshape(-1), axis=0)
        return lerp(g.reshape(B, N, 12).astype(jnp.float32), x, y)

    # (k) flat take, 4 separate corner gathers C=3 (index cost x4)
    def corners_flat_take(img, x, y):
        flat = img.reshape(B * N, 3)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        g = [
            jnp.take(flat, (base + yy * W + xx).reshape(-1), axis=0)
            for yy, xx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1))
        ]
        g = jnp.concatenate([v.reshape(B, N, 3) for v in g], axis=-1)
        return lerp(g, x, y)

    # (l) lax.gather fetching a (1,12) slice per index from (B*N, 12)
    def patch_lax_gather(img, x, y):
        p = make_patches(img).reshape(B * N, 12)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        idx = (base + idx_of(x, y)).reshape(-1, 1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        g = jax.lax.gather(
            p, idx, dn, slice_sizes=(1, 12),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return lerp(g.reshape(B, N, 12), x, y)

    # (m) x-pair rows: two takes of C=6 (img,right) at (y0,x0) and (y1,x0)
    def pairs_flat_take(img, x, y):
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        p = jnp.concatenate([img, right], axis=-1).reshape(B * N, 6)
        base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        g0 = jnp.take(p, (base + y0 * W + x0).reshape(-1), axis=0)
        g1 = jnp.take(p, (base + y1 * W + x0).reshape(-1), axis=0)
        g = jnp.concatenate(
            [g0.reshape(B, N, 6), g1.reshape(B, N, 6)], axis=-1
        )
        return lerp(g, x, y)

    timeit("(i) patch C=12 flat take f32        ", patch_flat_take, img, x, y)
    timeit("(j) patch C=12 flat take bf16       ", patch_flat_take_bf16, img, x, y)
    timeit("(k) 4x corner flat take C=3         ", corners_flat_take, img, x, y)
    timeit("(l) patch C=12 lax.gather in-bounds ", patch_lax_gather, img, x, y)
    timeit("(m) 2x pair flat take C=6           ", pairs_flat_take, img, x, y)


if __name__ == "__main__":
    main()
