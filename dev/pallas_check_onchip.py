"""On-chip validation + micro-bench of the (re)designed fused photometric
kernel: forward and hand-derived backward vs the XLA reference, at the
mono_fm bench shape AND the flagship 320x1024 shape the r3 design could
not compile (VERDICT r3 item 5).

Usage: python dev/pallas_check_onchip.py [B H W [K]] ...
Default shapes: 8 192 640, 4 320 1024.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tripled_tpu.ops.losses import reprojection_loss  # noqa: E402
from tripled_tpu.ops.pallas.photometric import (  # noqa: E402
    fused_min_reprojection,
    supports_shape,
)


def xla_min(target, preds):
    losses = [
        reprojection_loss(preds[:, k], target) for k in range(preds.shape[1])
    ]
    stacked = jnp.concatenate(losses, axis=-1)
    return jnp.min(stacked, -1), jnp.argmin(stacked, -1)


def check(B, H, W, K=4, C=3, dtype=jnp.float32):
    itemsize = jnp.dtype(dtype).itemsize
    print(f"--- shape B={B} K={K} {H}x{W} {jnp.dtype(dtype).name} "
          f"supports={supports_shape(H, W, itemsize)}")
    rng = np.random.RandomState(0)
    # quantize THROUGH the slab dtype so the XLA reference sees the same
    # texels (isolates kernel error from input quantization)
    target = jnp.asarray(rng.rand(B, H, W, C), jnp.float32).astype(
        dtype
    )
    preds = jnp.asarray(rng.rand(B, K, H, W, C), jnp.float32).astype(dtype)
    if dtype != jnp.float32:
        target_ref = target.astype(jnp.float32)
        preds_ref = preds.astype(jnp.float32)
    else:
        target_ref, preds_ref = target, preds
    grad_ks = tuple(range(K // 2, K))

    @jax.jit
    def fused(t, p):
        return fused_min_reprojection(t, p, 16, False, grad_ks, False)

    @jax.jit
    def ref(t, p):
        return xla_min(t, p)

    out_f, idx_f = fused(target, preds)
    out_r, idx_r = ref(target_ref, preds_ref)
    fwd_max = float(jnp.max(jnp.abs(out_f - out_r)))
    idx_agree = float(jnp.mean((idx_f == idx_r).astype(jnp.float32)))
    print(f"fwd max abs diff: {fwd_max:.3e}  argmin agree: {idx_agree:.6f}")

    # Backward comparison must share ONE argmin: the fused and XLA forwards
    # round differently, so on ~1e7 random pixels a handful of near-ties
    # pick different candidates, routing those pixels' gradients to a
    # different k — an O(0.1) dp diff that is argmin disagreement, not a
    # backward bug (verified by dev/bwd_debug.py: matched-idx diffs are
    # <3e-6 at every shape). Compare the hand-derived VJP against autodiff
    # of the SELECTED loss (same idx), which is the custom_vjp's contract.
    from tripled_tpu.ops.pallas.photometric import (
        _backward_tiled,
        _bwd_autodiff,
    )

    g = jnp.cos(out_f) - out_f * jnp.sin(out_f)  # d/do [o*cos(o)] cotangent

    @jax.jit
    def g_fused(t, p, g, i):
        return _backward_tiled(t, p, g, i, False, grad_ks, False)[1]

    @jax.jit
    def g_ref(t, p, g, i):
        return _bwd_autodiff(t, p, i, g)[1]

    gp_f = g_fused(target, preds, g, idx_f)
    gp_r = g_ref(target_ref, preds_ref, g, idx_f)
    bwd_max = float(
        jnp.max(
            jnp.abs(
                gp_f[:, grad_ks[0] :].astype(jnp.float32)
                - gp_r[:, grad_ks[0] :]
            )
        )
    )
    pruned_max = float(
        jnp.max(jnp.abs(gp_f[:, : grad_ks[0]].astype(jnp.float32)))
    )
    print(f"bwd (kept ks) max abs diff vs autodiff: {bwd_max:.3e}  "
          f"pruned ks max: {pruned_max:.1e}")

    def timeit(fn, *args):
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                r = fn(*args)
            v = jax.tree_util.tree_leaves(r)[0]
            _ = float(jnp.asarray(v).ravel()[0])  # forced readback
            times.append((time.perf_counter() - t0) / 5)
        return min(times) * 1e3

    print(f"fwd: pallas {timeit(fused, target, preds):7.2f} ms  "
          f"xla {timeit(ref, target_ref, preds_ref):7.2f} ms")
    print(f"bwd: pallas {timeit(g_fused, target, preds, g, idx_f):7.2f} ms  "
          f"autodiff {timeit(g_ref, target_ref, preds_ref, g, idx_f):7.2f} ms")
    # bf16 slabs: the kernel upcasts per tile but the bwd WRITES dp in
    # bf16 (one rounding) while autodiff keeps f32 throughout
    tol_fwd, tol_bwd = (1e-5, 5e-5) if itemsize == 4 else (2e-3, 5e-3)
    assert fwd_max < tol_fwd and bwd_max < tol_bwd and pruned_max == 0.0


def main():
    assert jax.devices()[0].platform == "tpu", "needs the TPU"
    # the flagship 320x1024 fits Mosaic's scoped-VMEM staging only with
    # bf16 slabs (supports_shape note 2) — check it the way net.py runs it
    shapes = [(8, 192, 640, jnp.float32), (4, 320, 1024, jnp.bfloat16)]
    if len(sys.argv) > 3:
        a = [int(v) for v in sys.argv[1:]]
        shapes = [tuple(a[i : i + 3]) + (jnp.float32,)
                  for i in range(0, len(a), 3)]
    for B, H, W, dt in shapes:
        check(B, H, W, dtype=dt)
    print("ALL OK")


if __name__ == "__main__":
    main()
