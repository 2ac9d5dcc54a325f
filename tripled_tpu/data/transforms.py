"""Host-side image augmentations (numpy/PIL), reproducing the reference's
torchvision pipeline closely enough for training-distribution parity:
shared ColorJitter (p=0.5, brightness/contrast/saturation 0.8–1.2, hue ±0.1 —
`mono/datasets/mono_dataset.py:64-73,188-191`) and horizontal flip (p=0.5).

All functions operate on float32 RGB arrays in [0, 1], HWC.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

_GRAY_W = np.array([0.299, 0.587, 0.114], np.float32)


def load_image(path: str) -> Image.Image:
    with open(path, "rb") as f:
        return Image.open(f).convert("RGB")


def resize_antialias(img: Image.Image, height: int, width: int) -> Image.Image:
    """PIL ANTIALIAS (Lanczos) resize, matching `mono_dataset.py:74`."""
    return img.resize((width, height), Image.LANCZOS)


def to_float(img: Image.Image) -> np.ndarray:
    return np.asarray(img, np.float32) / 255.0


def adjust_brightness(x: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(x * factor, 0.0, 1.0)


def adjust_contrast(x: np.ndarray, factor: float) -> np.ndarray:
    # torchvision: blend with the mean of the grayscale image
    mean = (x @ _GRAY_W).mean()
    return np.clip(mean + (x - mean) * factor, 0.0, 1.0)


def adjust_saturation(x: np.ndarray, factor: float) -> np.ndarray:
    gray = (x @ _GRAY_W)[..., None]
    return np.clip(gray + (x - gray) * factor, 0.0, 1.0)


def adjust_hue(x: np.ndarray, delta: float) -> np.ndarray:
    """Hue shift by `delta` (fraction of a full turn), via HSV round trip.

    Branch-free formulation (host-perf hot path: with the decode cache on,
    the old 6-way `np.select` HSV->RGB was 76% of a cached sample's cost):
    channel n in (5=R, 3=G, 1=B) equals v - v*s*clip(min(k, 4-k), 0, 1)
    with k = (n + 6h) mod 6 — algebraically the same piecewise function.
    """
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    # elementwise max/min chains are ~10x faster than .max(-1) reductions
    # over the stride-1 channel axis
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    c = maxc - minc
    s = np.where(maxc > 0, c / np.maximum(maxc, 1e-12), 0.0)
    safe_c = np.maximum(c, 1e-12)
    h = np.where(
        maxc == r, ((g - b) / safe_c) % 6.0,
        np.where(maxc == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = np.where(c > 0, h / 6.0, 0.0)
    h6 = ((h + delta) % 1.0) * 6.0
    vs = maxc * s

    def chan(n):
        k = (n + h6) % 6.0
        return maxc - vs * np.clip(np.minimum(k, 4.0 - k), 0.0, 1.0)

    out = np.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)
    return np.clip(out, 0.0, 1.0)


class ColorJitter:
    """torchvision-style ColorJitter: one sampled (factors, order) applied to
    every frame of an item (shared aug — `mono_dataset.py:84-90` docstring)."""

    def __init__(
        self,
        brightness=(0.8, 1.2),
        contrast=(0.8, 1.2),
        saturation=(0.8, 1.2),
        hue=(-0.1, 0.1),
    ):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def sample(self, rng: np.random.RandomState):
        fns = []
        b = rng.uniform(*self.brightness)
        c = rng.uniform(*self.contrast)
        s = rng.uniform(*self.saturation)
        h = rng.uniform(*self.hue)
        ops = [
            lambda x: adjust_brightness(x, b),
            lambda x: adjust_contrast(x, c),
            lambda x: adjust_saturation(x, s),
            lambda x: adjust_hue(x, h),
        ]
        order = rng.permutation(4)

        def apply(x):
            for i in order:
                x = ops[i](x)
            return x

        return apply


def make_erase_mask(
    rng: np.random.RandomState,
    height: int,
    width: int,
    erase_shape,
    erase_count: int,
) -> np.ndarray:
    """Random rectangular erase mask, 0 inside erased patches
    (`mono/datasets/kitti_dataset.py:163-182`). Returns (H, W, 1) float32."""
    mask = np.ones((height, width, 1), np.float32)
    eh, ew = int(erase_shape[0]), int(erase_shape[1])
    if erase_count == 1:
        off = (height - eh) // 2
        mask[off : off + eh, off : off + eh] = 0
        return mask
    for _ in range(erase_count):
        row = rng.randint(0, height - eh - 1)
        col = rng.randint(0, width - ew - 1)
        mask[row : row + eh, col : col + ew] = 0
    return mask


def motion_mask(
    target: np.ndarray,
    source: np.ndarray,
    blur_kernel: int = 9,
    threshold: float | None = None,
) -> np.ndarray:
    """Frame-difference motion mask (Otsu or fixed threshold), reproducing
    `mono/datasets/kitti_dataset.py:276-296` without cv2. Returns (H,W,1)."""
    tg = (target @ _GRAY_W * 255).astype(np.float32)
    sg = (source @ _GRAY_W * 255).astype(np.float32)
    diff = np.abs(sg - tg)
    # separable box blur ≈ gaussian blur for masking purposes
    k = blur_kernel
    kernel = np.ones(k, np.float32) / k
    blurred = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), 1, diff
    )
    blurred = np.apply_along_axis(
        lambda c: np.convolve(c, kernel, mode="same"), 0, blurred
    )
    if threshold is None:
        threshold = _otsu(blurred)
    return (blurred > threshold).astype(np.float32)[..., None]


def _otsu(img: np.ndarray) -> float:
    hist, bin_edges = np.histogram(img.reshape(-1), bins=256, range=(0, 255))
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0.0
    w0 = np.cumsum(hist)
    w1 = total - w0
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    cum_mean = np.cumsum(hist * centers)
    mean_total = cum_mean[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = cum_mean / w0
        mu1 = (mean_total - cum_mean) / w1
        between = w0 * w1 * (mu0 - mu1) ** 2
    between = np.nan_to_num(between)
    return float(centers[int(between.argmax())])
