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


def check(B, H, W, K=4, C=3):
    print(f"--- shape B={B} K={K} {H}x{W} supports={supports_shape(H, W)}")
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng.rand(B, K, H, W, C), jnp.float32)
    grad_ks = tuple(range(K // 2, K))

    @jax.jit
    def fused(t, p):
        return fused_min_reprojection(t, p, 16, False, grad_ks, False)

    @jax.jit
    def ref(t, p):
        return xla_min(t, p)

    out_f, idx_f = fused(target, preds)
    out_r, idx_r = ref(target, preds)
    fwd_max = float(jnp.max(jnp.abs(out_f - out_r)))
    idx_agree = float(jnp.mean((idx_f == idx_r).astype(jnp.float32)))
    print(f"fwd max abs diff: {fwd_max:.3e}  argmin agree: {idx_agree:.6f}")

    @jax.jit
    def g_fused(t, p):
        def loss(p):
            o, _ = fused_min_reprojection(t, p, 16, False, grad_ks, False)
            return (o * jnp.cos(o)).sum()

        return jax.grad(loss)(p)

    @jax.jit
    def g_ref(t, p):
        def loss(p):
            o, i = xla_min(t, p)
            return (o * jnp.cos(o)).sum()

        return jax.grad(loss)(p)

    gp_f = g_fused(target, preds)
    gp_r = g_ref(target, preds)
    bwd_max = float(
        jnp.max(jnp.abs(gp_f[:, grad_ks[0] :] - gp_r[:, grad_ks[0] :]))
    )
    pruned_max = float(jnp.max(jnp.abs(gp_f[:, : grad_ks[0]])))
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

    print(f"fwd   : pallas {timeit(fused, target, preds):7.2f} ms  "
          f"xla {timeit(ref, target, preds):7.2f} ms")
    print(f"fwd+bwd: pallas {timeit(g_fused, target, preds):7.2f} ms  "
          f"xla {timeit(g_ref, target, preds):7.2f} ms")
    assert fwd_max < 1e-5 and bwd_max < 5e-5 and pruned_max == 0.0


def main():
    assert jax.devices()[0].platform == "tpu", "needs the TPU"
    shapes = [(8, 192, 640), (4, 320, 1024)]
    if len(sys.argv) > 3:
        a = [int(v) for v in sys.argv[1:]]
        shapes = [tuple(a[i : i + 3]) for i in range(0, len(a), 3)]
    for B, H, W in shapes:
        check(B, H, W)
    print("ALL OK")


if __name__ == "__main__":
    main()
