"""Device-side ColorJitter — TPU-native photometric augmentation.

The reference jitters on the host inside the torch DataLoader
(`mono/datasets/mono_dataset.py:64-73,188-191`, torchvision ColorJitter).
On this platform the host has ONE core, so with the decode cache on, the
numpy jitter dominates sample assembly (BASELINE.md round 3). The jitter
is pure elementwise math — microseconds of TPU time — so the pipeline can
instead ship the per-sample factors (a few floats) and synthesize
`color_aug` on device: host work and host->device transfer are both
roughly halved.

Numerics mirror `data/transforms.py` exactly (same formulas, float32,
shared factors + op order across a sample's frames; per-frame contrast
mean), pinned by tests/test_data.py::test_device_jitter_matches_host.

Param packing (one fixed-shape f32 array per sample, stacked to (B, 9)):
  [0:4] factors b, c, s, h   [4:8] op order (permutation of 0..3)   [8] apply
`apply` = 0 reproduces the un-jittered 50% of samples (color_aug == color).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def _contrast(x, f):
    # per-frame grayscale mean (transforms.py applies the op frame by frame)
    mean = jnp.mean(x @ _GRAY_W, axis=(-2, -1), keepdims=True)[..., None]
    return jnp.clip(mean + (x - mean) * f, 0.0, 1.0)


def _saturation(x, f):
    gray = (x @ _GRAY_W)[..., None]
    return jnp.clip(gray + (x - gray) * f, 0.0, 1.0)


def _hue(x, delta):
    # identical branch-free HSV round trip as transforms.adjust_hue
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    h = jnp.where(
        maxc == r, ((g - b) / safe_c) % 6.0,
        jnp.where(maxc == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = jnp.where(c > 0, h / 6.0, 0.0)
    h6 = ((h + delta) % 1.0) * 6.0
    vs = maxc * s

    def chan(n):
        k = (n + h6) % 6.0
        return maxc - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    out = jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)
    return jnp.clip(out, 0.0, 1.0)


def _jitter_one(img: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """img (F, H, W, 3) f32, params (9,) -> jittered (F, H, W, 3)."""
    factors = params[0:4]
    order = params[4:8].astype(jnp.int32)
    ops = [
        lambda x: _brightness(x, factors[0]),
        lambda x: _contrast(x, factors[1]),
        lambda x: _saturation(x, factors[2]),
        lambda x: _hue(x, factors[3]),
    ]
    x = img
    for j in range(4):
        x = jax.lax.switch(order[j], ops, x)
    return jnp.where(params[8] > 0, x, img)


def color_jitter(color: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Batched device jitter: color (B, F, H, W, 3) f32, params (B, 9)."""
    return jax.vmap(_jitter_one)(color, params)


def sample_jitter_params(rng, jitter, do_color_aug: bool):
    """Host-side: draw the (9,) param vector with the SAME rng consumption
    as the host path (`datasets.py:sample` + `transforms.ColorJitter.sample`),
    so host- and device-jitter runs see identical randomness streams."""
    import numpy as np

    if not do_color_aug:
        return np.array([1, 1, 1, 0, 0, 1, 2, 3, 0], np.float32)
    b = rng.uniform(*jitter.brightness)
    c = rng.uniform(*jitter.contrast)
    s = rng.uniform(*jitter.saturation)
    h = rng.uniform(*jitter.hue)
    order = rng.permutation(4)
    return np.concatenate(
        [[b, c, s, h], order, [1.0]]
    ).astype(np.float32)
