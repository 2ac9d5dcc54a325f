"""Gather cost vs padded row width: find the smallest patch-row padding
that reaches the fast-gather regime (dev/gather_bench.py variant (d))."""

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

    def padded(pad_to, use_barrier=True, dtype=jnp.float32):
        def f(img, x, y):
            p = make_patches(img).astype(dtype).reshape(B, N, 12)
            if pad_to > 12:
                p = jnp.pad(p, ((0, 0), (0, 0), (0, pad_to - 12)))
            if use_barrier:
                p = jax.lax.optimization_barrier(p)
            p = p.reshape(B * N, pad_to if pad_to > 12 else 12)
            base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            g = jnp.take(p, (base + y0 * W + x0).reshape(-1), axis=0)
            g = g.reshape(B, N, -1)[..., :12].astype(jnp.float32)
            return lerp(g, x, y)

        return f

    for pad in (12, 16, 24, 32, 64, 128):
        timeit(f"patch flat take f32 pad->{pad}", padded(pad), img, x, y)
    timeit("patch flat take bf16 pad->32", padded(32, dtype=jnp.bfloat16),
           img, x, y)
    timeit("patch flat take bf16 pad->64", padded(64, dtype=jnp.bfloat16),
           img, x, y)


if __name__ == "__main__":
    main()
