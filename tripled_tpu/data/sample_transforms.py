"""Reference-style sample-dict transforms (tuple keys) — the remainder of
the mytransforms zoo (`mono/datasets/mytransforms.py:145-731`) beyond the
image+mask pairs in `seg_transforms.py`.

Samples are flat dicts whose tuple keys follow the reference convention:
  ('color', frame, scale), ('depth', frame, scale), ('flow', frame, scale),
  ('segmentation', frame, scale), ('camera_intrinsics'/'K', scale), plus
  non-tuple extras ('stereo_T', ...).

Values are numpy (float32 HWC images in [0,1], HW depth, HWC flow) — no
PIL-object state is threaded through the pipeline; the Load* transforms
therefore normalize array formats where the reference converted
numpy↔PIL. Randomness comes from an explicit np.random.RandomState (the
reference uses the global `random`), keeping the pipeline reproducible and
prefetch-thread-safe.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

IMAGENAMES = ["color", "segmentation", "depth", "flow"]
NUMERICNAMES = ["camera_intrinsics", "poses", "velocity", "timestamp"]


def _image_keys(sample):
    for key in list(sample.keys()):
        if isinstance(key, tuple) and len(key) == 3:
            yield key, key[0]


class LoadDepth:
    """Format-normalize raw depth entries to float32 arrays
    (`mytransforms.py:145-175`; the PIL wrap is a no-op in a numpy pipeline)."""

    def __call__(self, sample, rng=None):
        for key, name in _image_keys(sample):
            if "depth" in name:
                sample[key] = np.asarray(sample[key], np.float32)
        return sample


class ConvertDepth:
    """Raw depth encodings → meters (`mytransforms.py:178-234`)."""

    def __init__(self, depth_mode=None):
        self.depth_mode = depth_mode

    def set_mode(self, depth_mode):
        self.depth_mode = depth_mode

    def __call__(self, sample, rng=None):
        for key, name in _image_keys(sample):
            if "depth" not in name:
                continue
            d = np.asarray(sample[key], np.float64)
            if self.depth_mode == "uint_16":
                d = d / 256.0
            elif self.depth_mode == "uint_16_subtract_one":
                # Cityscapes disparity → depth (baseline*focal formula kept
                # verbatim, mytransforms.py:197-199)
                m = d > 1.0
                d[m] = 0.209313 * 2262.52 / ((d[m] - 1.0) / 256.0)
            elif self.depth_mode == "normalized_100":
                d = d / 100.0
            elif self.depth_mode == "3_channel_normalized_100":
                d = d / 100.0
                d = d[:, :, 0].reshape(d.shape[0], d.shape[1])
            else:
                raise ValueError(f"Unknown depth mode {self.depth_mode}")
            sample[key] = d.astype(np.float32)
        return sample

    def inverse(self, sample):
        for key, name in _image_keys(sample):
            if "depth" not in name:
                continue
            d = np.asarray(sample[key], np.float64)
            if self.depth_mode == "uint_16":
                sample[key] = (d * 256.0).astype(np.float32)
            elif self.depth_mode == "normalized_100":
                sample[key] = (d * 100.0).astype(np.float32)
            elif self.depth_mode == "3_channel_normalized_100":
                sample[key] = np.repeat(
                    (d * 100.0)[:, :, None], 3, axis=2
                ).astype(np.float32)
            else:
                raise NotImplementedError(self.depth_mode)
        return sample


class LoadFlow:
    """BGR→RGB + uint8 packing of the raw flow png (`mytransforms.py:237-255`)."""

    def __init__(self, validation_mode: bool):
        self.validation_mode = validation_mode

    def __call__(self, sample, rng=None):
        for key, name in _image_keys(sample):
            if "flow" in name:
                f = np.asarray(sample[key])[:, :, ::-1].copy()  # BGR→RGB
                if not self.validation_mode:
                    f = f.astype(np.float64)
                    f[:, :, 0:2] = f[:, :, 0:2] / 256.0
                    f = f.astype(np.uint8)
                sample[key] = f
        return sample


class ConvertFlow:
    """Flow png encoding → pixel offsets, KITTI convention
    (`mytransforms.py:261-297`): (v*256 - 2^15)/64, invalid pixels zeroed
    via the validity channel."""

    def __init__(self, flow_mode=None, validation_mode=None):
        self.flow_mode = flow_mode
        self.validation_mode = validation_mode

    def set_mode(self, flow_mode=None, validation_mode=None):
        if flow_mode is not None:
            self.flow_mode = flow_mode
        if validation_mode is not None:
            self.validation_mode = validation_mode

    def __call__(self, sample, rng=None):
        for key, name in _image_keys(sample):
            if "flow" not in name:
                continue
            f = np.asarray(sample[key], np.float64).copy()
            if not self.validation_mode:
                f[:, :, 0:2] = f[:, :, 0:2] * 256
            if self.flow_mode == "kitti":
                f[:, :, 0:2] = (f[:, :, 0:2] - 2**15) / 64
            else:
                raise ValueError(f"Unknown flow mode {self.flow_mode}")
            f[:, :, 0] = f[:, :, 2] * f[:, :, 0]
            f[:, :, 1] = f[:, :, 2] * f[:, :, 1]
            sample[key] = f
        return sample


class LoadNumerics:
    """Numeric entries → float arrays (`mytransforms.py:303-317`)."""

    def __call__(self, sample, rng=None):
        for key, name in _image_keys(sample):
            if any(item in name for item in NUMERICNAMES):
                sample[key] = np.asarray(sample[key], np.float64)
        return sample


class ExchangeStereo:
    """Swap left/right image roles + negate the stereo baseline
    (`mytransforms.py:323-359`)."""

    def _should_flip(self, rng):
        return True

    def __call__(self, sample, rng=None):
        if not self._should_flip(rng):
            return sample
        new_sample = {}
        for key in sample:
            if not (isinstance(key, tuple) and len(key) == 3):
                new_sample[key] = sample[key]
                continue
            name = key[0]
            if any(item in name for item in IMAGENAMES):
                if "right" in name:
                    new_key = (key[0][:-6], key[1], key[2])
                else:
                    new_key = (key[0] + "_right", key[1], key[2])
                new_sample[new_key] = sample[key]
            else:
                new_sample[key] = sample[key]
        if "stereo_T" in new_sample:
            new_sample["stereo_T"] = np.asarray(new_sample["stereo_T"]).copy()
            new_sample["stereo_T"][0, 3] *= -1
        return new_sample


class RandomExchangeStereo(ExchangeStereo):
    """(`mytransforms.py:365-369`)."""

    def _should_flip(self, rng):
        return rng.uniform(0, 1) < 0.5


class RemoveRightStereo:
    """(`mytransforms.py:372-383`)."""

    def __call__(self, sample, rng=None):
        for key in list(sample.keys()):
            if isinstance(key, tuple) and len(key) == 3 and "right" in key[0]:
                del sample[key]
        return sample


class CreateScaledImage:
    """Duplicate every entry at scale index 0 (`mytransforms.py:428-455`)."""

    def __init__(self, keep_originals: bool = True):
        self.keep_originals = keep_originals

    def __call__(self, sample, rng=None):
        new_sample = {}
        if self.keep_originals:
            new_sample.update(sample)
        for key in sample:
            if isinstance(key, tuple) and len(key) == 3:
                new_sample[(key[0], key[1], 0)] = sample[key]
            elif isinstance(key, tuple) and len(key) == 2:
                new_sample[(key[0], 0)] = sample[key]
            else:
                new_sample[key] = sample[key]
        return new_sample


def _shift_zero_fill(img: np.ndarray, tx: int, ty: int) -> np.ndarray:
    """Integer translate with 0 fill ≙ torchvision affine(translate=(tx,ty))."""
    out = np.zeros_like(img)
    h, w = img.shape[:2]
    sy0, sy1 = max(0, -ty), min(h, h - ty)
    dy0 = max(0, ty)
    sx0, sx1 = max(0, -tx), min(w, w - tx)
    dx0 = max(0, tx)
    out[dy0 : dy0 + (sy1 - sy0), dx0 : dx0 + (sx1 - sx0)] = img[
        sy0:sy1, sx0:sx1
    ]
    return out


def _center_crop(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = int(round((h - out_h) / 2.0))
    left = int(round((w - out_w) / 2.0))
    return img[top : top + out_h, left : left + out_w]


class RandomTranslate:
    """Random shift then center crop so no invalid border remains
    (`mytransforms.py:538-580`)."""

    def __init__(self, translation, fraction: float = 1.0):
        if isinstance(translation, int):
            self.translation = (translation, translation)
        else:
            self.translation = tuple(translation)
        self.fraction = fraction

    def __call__(self, sample, rng):
        is_trans = rng.uniform(0, 1) < self.fraction
        tx = int(rng.randint(-self.translation[0], self.translation[0] + 1))
        ty = int(rng.randint(-self.translation[1], self.translation[1] + 1))
        h, w = np.asarray(sample[("color", 0, 0)]).shape[:2]
        crop_h = h - 2 * self.translation[1]
        crop_w = w - 2 * self.translation[0]
        for key, name in _image_keys(sample):
            if key[-1] != 0:
                continue
            if any(item in name for item in IMAGENAMES) and is_trans:
                sample[key] = _shift_zero_fill(np.asarray(sample[key]), tx, ty)
        if is_trans:
            for key, name in _image_keys(sample):
                if key[-1] == 0 and any(i in name for i in IMAGENAMES):
                    sample[key] = _center_crop(
                        np.asarray(sample[key]), crop_h, crop_w
                    )
        return sample


class MultiResize:
    """Power-of-two pyramid of every image entry + per-scale K
    (`mytransforms.py:679-725`): BILINEAR for color/processed-depth, NEAREST
    for segmentation/depth/flow, row scaling for intrinsics."""

    def __init__(self, scales, image_types=("color", "camera_intrinsics", "K"),
                 exceptions=None):
        self.scales = scales
        self.image_types = image_types
        self.exceptions = exceptions

    def _resize(self, arr, h, w, nearest):
        mode = Image.NEAREST if nearest else Image.BILINEAR
        arr = np.asarray(arr)
        if arr.ndim == 2:
            return np.asarray(
                Image.fromarray(arr.astype(np.float32), "F").resize((w, h), mode)
            )
        chans = [
            np.asarray(
                Image.fromarray(arr[:, :, c].astype(np.float32), "F").resize(
                    (w, h), mode
                )
            )
            for c in range(arr.shape[2])
        ]
        return np.stack(chans, axis=-1)

    def __call__(self, sample, rng=None):
        h, w = np.asarray(sample[("color", 0, 0)]).shape[:2]
        for key in list(sample.keys()):
            if not (isinstance(key, tuple) and key[-1] == 0):
                continue
            name = key[0]
            if self.image_types is not None and not any(
                item in name for item in self.image_types
            ):
                continue
            if self.exceptions is not None and any(
                item in name for item in self.exceptions
            ):
                continue
            for scale in self.scales:
                f = 2**scale
                if "color" in name or ("depth" in name and "processed" in name):
                    new = self._resize(sample[key], h // f, w // f, False)
                elif "segmentation" in name or "depth" in name or "flow" in name:
                    new = self._resize(sample[key], h // f, w // f, True)
                elif "camera_intrinsics" in name or "K" in name:
                    K = np.asarray(sample[key]).copy()
                    K[0, :] = K[0, :] / f
                    K[1, :] = K[1, :] / f
                    new = K
                else:
                    continue
                sample[tuple(list(key[:-1]) + [scale])] = new
        return sample
