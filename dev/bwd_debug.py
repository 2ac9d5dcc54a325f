"""Localize on-chip backward discrepancies of the fused photometric
kernel: compares the hand-derived Pallas backward vs the recompute-VJP
autodiff backward per-element (SHARING one argmin, which is the custom
VJP's contract) and prints where (rows/cols/candidates) the error
concentrates. Historical note: the round-4 pallas_check_onchip "0.1 bwd
diff" was argmin disagreement between the fused and XLA FORWARDS at ~10
near-tie pixels out of 9.8M — matched-idx comparisons here showed <3e-6
at every shape, which is why the check now shares idx.

Usage: python dev/bwd_debug.py [B K H W C]          # full backward
       python dev/bwd_debug.py pruned [B K H W C]   # grad_ks + no dt path
"""

import sys

sys.path.insert(0, "/root/repo")

from tripled_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tripled_tpu.ops.pallas.photometric import (  # noqa: E402
    _backward_tiled,
    _bwd_autodiff,
    _forward_tiled,
)


def _report_dp(dp_k, dp_r, k0):
    d = np.abs(np.asarray(dp_k) - np.asarray(dp_r))[:, k0:]
    print(f"dp(kept ks) max {d.max():.3e} mean {d.mean():.3e}")
    if d.max() > 1e-4:
        row_err = d.max(axis=(0, 1, 3, 4))
        col_err = d.max(axis=(0, 1, 2, 4))
        k_err = d.max(axis=(0, 2, 3, 4))
        c_err = d.max(axis=(0, 1, 2, 3))
        print(f"  bad rows: {np.where(row_err > 1e-4)[0][:40]}")
        print(f"  bad cols: {np.where(col_err > 1e-4)[0][:40]}")
        print(f"  per-kept-candidate max: {k_err}  per-channel max: {c_err}")


def main():
    a = [int(v) for v in sys.argv[1:]] or [1, 2, 48, 128, 1]
    B, K, H, W, C = a
    print(f"FULL B={B} K={K} H={H} W={W} C={C}")
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng.rand(B, K, H, W, C), jnp.float32)
    g = jnp.asarray(rng.rand(B, H, W), jnp.float32)

    _, idx = jax.jit(lambda t, p: _forward_tiled(t, p, 16, False))(
        target, preds
    )
    dt_k, dp_k = jax.jit(
        lambda t, p, g, i: _backward_tiled(t, p, g, i, False, None, True)
    )(target, preds, g, idx)
    dt_r, dp_r = jax.jit(_bwd_autodiff)(target, preds, idx, g)
    d = np.abs(np.asarray(dt_k) - np.asarray(dt_r))
    print(f"dt: max {d.max():.3e} mean {d.mean():.3e}")
    _report_dp(dp_k, dp_r, 0)


def pruned():
    a = [int(v) for v in sys.argv[2:]] or [1, 4, 48, 128, 3]
    B, K, H, W, C = a
    grad_ks = tuple(range(K // 2, K))
    print(f"PRUNED B={B} K={K} H={H} W={W} C={C} grad_ks={grad_ks}")
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    preds = jnp.asarray(rng.rand(B, K, H, W, C), jnp.float32)
    g = jnp.asarray(rng.rand(B, H, W), jnp.float32)
    _, idx = jax.jit(lambda t, p: _forward_tiled(t, p, 16, False))(
        target, preds
    )
    _, dp_k = jax.jit(
        lambda t, p, g, i: _backward_tiled(t, p, g, i, False, grad_ks, False)
    )(target, preds, g, idx)
    _, dp_r = jax.jit(_bwd_autodiff)(target, preds, idx, g)
    _report_dp(dp_k, dp_r, grad_ks[0])


if __name__ == "__main__":
    if sys.argv[1:2] == ["pruned"]:
        pruned()
    else:
        main()
