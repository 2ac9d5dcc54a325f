"""Probe pl.Element (elementwise-start BlockSpec dim) on TPU: read
overlapping (WIN, W) row windows with stride TH from a planar array —
the access pattern the fused photometric kernel needs for its SSIM row
halo. If this compiles and matches numpy, the kernel can drop both the
manual-DMA design (r3, scoped-VMEM wall) and the XLA-side pre-tiling
(r4, slow materialization).

Usage: python dev/element_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

B, R, W = 2, 56, 256  # rows padded so the last 24-row window fits
TH, WIN = 16, 24  # WIN must be 8-aligned (Mosaic block constraint)
N_TILES = 3  # windows [t*TH, t*TH+24); last = [32, 56)


def main():
    x = jnp.asarray(
        np.random.RandomState(0).rand(B, R, W).astype(np.float32)
    )

    def kernel(x_ref, o_ref):
        acc = jnp.zeros((TH, W), jnp.float32)
        for di in range(3):
            acc = acc + x_ref[0, di : di + TH, :]
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(B, N_TILES),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(WIN), pl.Element(W)),
                lambda b, t: (b, t * TH, 0),
            )
        ],
        out_specs=pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N_TILES * TH, W), jnp.float32),
    )(x)
    ref = sum(
        np.asarray(x)[:, di : di + N_TILES * TH, :] for di in range(3)
    )
    err = float(np.abs(np.asarray(out) - ref).max())
    print(f"overlapping Element windows: max err {err:.3e}")
    assert err < 1e-6
    print("OK")


if __name__ == "__main__":
    main()
