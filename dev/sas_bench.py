"""Micro-bench: 5x5 stride-1 maxpool fwd+bwd vs two chained 3x3 maxpools.

max over a 5x5 window == max3x3(max3x3(x)) exactly (union of windows; SAME
padding pads with -inf which is neutral), so the forward is bit-identical.
The backward select-and-scatter routes the cotangent to the window argmax
either way (ties, measure-zero on real activations, may route differently
— torch also picks an arbitrary tied element). The round-4 profile shows
13.7 ms/step of select-and-scatter from the CRP 5x5 pools; SAS cost scales
with window size, so 2x(3x3)=18 compares could beat 1x(5x5)=25.

Usage: python dev/sas_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402


def pool5(x):
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


def pool33(x):
    x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


# the shipping tie-averaged eq-mask implementation (two 25-shift passes)
from tripled_tpu.models.layers import (  # noqa: E402
    max_pool_5x5_same_eqmask as pool5_eqmask,
)


def bench(fn, x, label):
    @jax.jit
    def g(x):
        return jax.grad(lambda x: (fn(x) ** 2).sum())(x)

    r = g(x)
    r.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            r = g(x)
        _ = float(r.ravel()[0])
        times.append((time.perf_counter() - t0) / 10)
    print(f"{label}: {min(times)*1e3:7.2f} ms fwd+bwd")
    return r


def main():
    # the CRP shape from the bs16 profile: bf16[16,48,160,256], 4 stages
    # per block x 4 blocks; bench one pool at that shape
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(
            np.random.RandomState(0).rand(16, 48, 160, 256), dtype
        )
        print(f"dtype={dtype.__name__}")
        a = bench(pool5, x, "  5x5 SAS       ")
        b = bench(pool33, x, "  3x3+3x3 SAS   ")
        c = bench(pool5_eqmask, x, "  5x5 eq-mask   ")
        # forward bit-identity
        fa = jax.jit(pool5)(x)
        fb = jax.jit(pool33)(x)
        same = bool(jnp.all(fa == fb))
        print(f"  forward bit-identical: {same}")
        assert same
        # eq-mask gradient vs SAS on the UNIFORM tensors: includes tie-
        # averaging deviations for BOTH dtypes — bf16's ~8-bit mantissa
        # collides heavily, and even uniform f32 collides at this size
        # (2M positions x 300 same-window pairs over ~2^30 representable
        # values -> hundreds of expected in-window ties; the r4 note
        # calling f32 'tie-free' was wrong and its gd==0 assert tripped).
        gd = float(jnp.max(jnp.abs(a - c)))
        print(
            "  eq-mask vs SAS grad max|diff| "
            f"(uniform draw, includes quantization ties): {gd:.3e}"
        )

    # tie-free-BY-CONSTRUCTION correctness check (f32): a shuffled
    # permutation of n distinct values with spacing 1/n >> f32 ULP, so no
    # window contains a tie and the eq-mask backward must route exactly
    # like select-and-scatter
    n = 2 * 48 * 160 * 64
    perm = np.random.RandomState(1).permutation(n).astype(np.float64)
    xt = jnp.asarray((perm / n).reshape(2, 48, 160, 64), jnp.float32)
    g5 = jax.jit(jax.grad(lambda t: (pool5(t) ** 2).sum()))(xt)
    gm = jax.jit(jax.grad(lambda t: (pool5_eqmask(t) ** 2).sum()))(xt)
    gd = float(jnp.max(jnp.abs(g5 - gm)))
    print(f"  eq-mask vs SAS grad max|diff| (tie-free by construction): {gd:.3e}")
    assert gd == 0.0, gd


if __name__ == "__main__":
    main()
