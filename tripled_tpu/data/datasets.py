"""Triplet-frame datasets (host-side numpy; fixed-shape outputs for jit).

Re-design of the reference's `mono/datasets/mono_dataset.py` /
`kitti_dataset.py` family: each dataset produces one *sample dict* of
fixed-shape float32 arrays, stacked over the frame axis in `frame_ids` order
(index 0 = target). Batching/sharding/prefetch live in `pipeline.py`.

Sample keys (subset depending on dataset):
  color      (F, H, W, 3)    color_aug (F, H, W, 3)
  K, inv_K   (4, 4)
  mask       (H, W, 1)       1 = keep, 0 = erased (inpaint datasets)
  stereo_T   (4, 4)          when "s" ∈ frame_ids
  map_mask   (F-1, H, W, 1)  map_params (F-1, 3)
Validation items additionally carry `gt_depth` (native-res, variable shape —
kept host-side; see pipeline.EvalLoader).

Reference parity notes:
- shared ColorJitter and flip probabilities/ranges: `mono_dataset.py:64-73,140-141`
- missing-neighbor fallback to the center frame: `mono_dataset.py:160-168`
- intrinsics: normalized K scaled by (W, H) then inverted: `mono_dataset.py:173-180`
- stereo extrinsics ±0.015 with flip sign: `mono_dataset.py:194-199`
- KITTI normalized K and side map: `kitti_dataset.py:126-132`
- erase masks: `kitti_dataset.py:163-182`; motion masks: `:276-296`
"""

from __future__ import annotations

import os
import threading
from typing import Sequence

import numpy as np

from tripled_tpu.config import DataConfig
from tripled_tpu.data import kitti_utils
from tripled_tpu.data.transforms import (
    ColorJitter,
    load_image,
    make_erase_mask,
    motion_mask,
    resize_antialias,
    to_float,
)


class _DecodeCache:
    """Bounded in-RAM cache of decoded+resized frames, stored uint8.

    Values live on the uint8/255 grid — exactly the PIL decode path (and
    the reference's PIL+ToTensor pipeline, `mono_dataset.py:129-141`), so
    caching is lossless there. The native loader keeps sub-uint8 Lanczos
    precision but is byte-exact vs PIL after rounding
    (tests/test_native_loader.py), so with the cache both decoders yield
    the identical, reference-grid sample.
    Frames are cached UNFLIPPED and mirrored with a numpy view on read —
    the native loader mirrors *after* resizing (loader.cpp resize_lanczos),
    so this is bit-identical; equality incl. flips is pinned by
    tests/test_data.py. Insertion stops at the byte cap (training epochs
    reshuffle uniformly, so eviction buys nothing); thread-safe under the
    BatchLoader worker pool.
    """

    def __init__(self, cap_bytes: int):
        self.cap = cap_bytes
        self.used = 0
        self._lock = threading.Lock()
        self._d: dict = {}

    def get(self, key):
        return self._d.get(key)

    def put(self, key, arr: np.ndarray) -> None:
        with self._lock:
            if key in self._d or self.used + arr.nbytes > self.cap:
                return
            self._d[key] = arr
            self.used += arr.nbytes


class MonoDataset:
    """Base triplet loader. Subclasses define `K_norm`, `full_res_shape`,
    `get_image_path`."""

    K_norm = np.array(
        [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    full_res_shape = (1242, 375)  # (W, H)

    def __init__(
        self,
        data_path: str,
        filenames: Sequence[str],
        height: int,
        width: int,
        frame_ids: Sequence,
        cfg: DataConfig | None = None,
        is_train: bool = False,
        img_ext: str = ".jpg",
        gt_depth_path: str | None = None,
    ):
        self.data_path = data_path
        self.filenames = list(filenames)
        self.height = height
        self.width = width
        self.frame_ids = tuple(frame_ids)
        self.cfg = cfg or DataConfig()
        self.is_train = is_train
        self.img_ext = img_ext
        self.jitter = ColorJitter()
        # native C++ decode+resize fast path (fused Lanczos, threaded batch);
        # falls back to PIL when the toolchain/libs are absent or per-image
        # decode fails. Disable with TRIPLED_NATIVE_LOADER=0.
        self.use_native = os.environ.get("TRIPLED_NATIVE_LOADER", "1") == "1"
        if self.use_native:
            from tripled_tpu.data import native_loader

            self.use_native = native_loader.available()
        if self.cfg.ship_uint8 and is_train and not self.cfg.device_color_aug:
            raise ValueError(
                "DataConfig.ship_uint8 requires device_color_aug=True for "
                "training datasets (the host ColorJitter path needs float "
                "frames)"
            )
        cap_mb = int(
            os.environ.get(
                "TRIPLED_DECODE_CACHE_MB", str(self.cfg.decode_cache_mb)
            )
        )
        self._decode_cache = _DecodeCache(cap_mb << 20) if cap_mb > 0 else None
        self.gt_depths = None
        if not is_train and gt_depth_path:
            self.gt_depths = np.load(
                gt_depth_path, allow_pickle=True, fix_imports=True, encoding="latin1"
            )["data"]

    def __len__(self):
        return len(self.filenames)

    # -------------------------------------------------------- subclass API

    def get_image_path(self, folder, frame_index, side) -> str:
        raise NotImplementedError

    def get_color(self, folder, frame_index, side, do_flip):
        img = load_image(self.get_image_path(folder, frame_index, side))
        if do_flip:
            img = img.transpose(0)  # PIL FLIP_LEFT_RIGHT
        return img

    # -------------------------------------------------------- sample

    def parse_line(self, index):
        line = self.filenames[index].split()
        folder = line[0]
        frame_index = int(line[1]) if len(line) == 3 else 0
        side = line[2] if len(line) == 3 else None
        return folder, frame_index, side

    def _load_resized(
        self, folder, frame_index, side, do_flip, as_uint8=False
    ) -> np.ndarray:
        """One frame → float32 (H, W, 3) in [0,1] (or uint8 [0,255] when
        `as_uint8`, for DataConfig.ship_uint8), resized + optionally
        flipped; decode-cache fast path, then native loader, then PIL."""
        cache = self._decode_cache
        path = (
            self._cache_key(folder, frame_index, side)
            if cache is not None
            else None
        )
        if path is not None:
            hit = cache.get(path)
            if hit is None:
                dec = self._decode(folder, frame_index, side, do_flip=False)
                hit = np.rint(dec * 255.0).astype(np.uint8)
                cache.put(path, hit)
            # fills are quantized too, so cache-on output sits on the
            # uint8/255 reference grid regardless of hit/miss or decoder
            img = hit if as_uint8 else hit.astype(np.float32) / 255.0
            return img[:, ::-1] if do_flip else img
        dec = self._decode(folder, frame_index, side, do_flip)
        if as_uint8:
            # same quantization as the cache fill: the uint8/255 grid is
            # the reference's own post-PIL-resize grid
            return np.rint(dec * 255.0).astype(np.uint8)
        return dec

    def _cache_key(self, folder, frame_index, side):
        """Decode-cache key for one frame; None disables caching for it
        (e.g. datasets without per-frame paths)."""
        try:
            return self.get_image_path(folder, frame_index, side)
        except NotImplementedError:
            return None

    def _decode(self, folder, frame_index, side, do_flip) -> np.ndarray:
        if self.use_native:
            from tripled_tpu.data import native_loader

            try:
                return native_loader.load_image(
                    self.get_image_path(folder, frame_index, side),
                    self.height, self.width, flip=do_flip,
                )
            except Exception:
                pass
        img = self.get_color(folder, frame_index, side, do_flip)
        return to_float(resize_antialias(img, self.height, self.width))

    def load_frames(self, index, do_flip):
        folder, frame_index, side = self.parse_line(index)
        u8 = self.cfg.ship_uint8
        frames = []
        for i in self.frame_ids:
            if i == "s":
                other = {"r": "l", "l": "r"}[side]
                frames.append(
                    self._load_resized(
                        folder, frame_index, other, do_flip, as_uint8=u8
                    )
                )
            else:
                try:
                    frames.append(
                        self._load_resized(
                            folder, frame_index + i, side, do_flip, as_uint8=u8
                        )
                    )
                except Exception:
                    frames.append(
                        self._load_resized(
                            folder, frame_index, side, do_flip, as_uint8=u8
                        )
                    )
        return frames, side

    def sample(self, index: int, rng: np.random.RandomState) -> dict:
        do_color_aug = self.is_train and rng.rand() > 0.5
        do_flip = self.is_train and rng.rand() > 0.5

        frames, side = self.load_frames(index, do_flip)
        # (F, H, W, 3) float32 [0,1] — or uint8 [0,255] under ship_uint8
        # (net.py divides on device; same uint8/255 grid either way)
        colors = np.stack(frames)
        u8 = colors.dtype == np.uint8
        jitter_params = None
        if self.is_train and self.cfg.device_color_aug:
            # TPU-native mode: ship the factors, synthesize color_aug on
            # device (ops/jitter.py) — same rng stream as the host path
            from tripled_tpu.ops.jitter import sample_jitter_params

            jitter_params = sample_jitter_params(rng, self.jitter, do_color_aug)
            color_aug = colors
        elif do_color_aug:
            aug = self.jitter.sample(rng)
            color_aug = np.stack([aug(c) for c in colors])
        else:
            color_aug = colors.copy()

        K = self.K_norm.copy()
        K[0, :] *= self.width
        K[1, :] *= self.height
        inv_K = np.linalg.pinv(K).astype(np.float32)

        out = {
            "color": colors if u8 else colors.astype(np.float32),
            "K": K.astype(np.float32),
            "inv_K": inv_K,
        }
        if jitter_params is not None:
            # device mode: color_aug is synthesized on-chip from `color` +
            # these 9 floats (net.py __call__), halving host->device bytes
            out["jitter_params"] = jitter_params
        elif u8:
            out["color_aug"] = color_aug  # shared uint8; device divides
        else:
            out["color_aug"] = color_aug.astype(np.float32)
        if self.cfg.add_lab:
            # PIL ImageCms LAB equivalent: D50-ish Lab scaled to [0,1] per
            # channel like a uint8 LAB image (mono_dataset.py:11-15,104-109)
            from PIL import Image, ImageCms

            srgb_p = ImageCms.createProfile("sRGB")
            lab_p = ImageCms.createProfile("LAB")
            tf = ImageCms.buildTransformFromOpenProfiles(
                srgb_p, lab_p, "RGB", "LAB"
            )
            labs = []
            for c in colors:
                im = Image.fromarray(
                    c if u8 else (c * 255).astype(np.uint8)
                )
                labs.append(
                    np.asarray(ImageCms.applyTransform(im, tf), np.float32) / 255.0
                )
            out["color_lab"] = np.stack(labs)
        if "s" in self.frame_ids:
            stereo_T = np.eye(4, dtype=np.float32)
            baseline_sign = -1 if do_flip else 1
            side_sign = -1 if side == "l" else 1
            stereo_T[0, 3] = side_sign * baseline_sign * 0.015
            out["stereo_T"] = stereo_T

        self.post_process(out, rng)

        if self.gt_depths is not None:
            out["gt_depth"] = np.asarray(self.gt_depths[index], np.float32)
        return out

    def post_process(self, out: dict, rng: np.random.RandomState) -> None:
        """Hook for masks / pretext extras."""


class KITTIRawDataset(MonoDataset):
    side_map = {"2": 2, "3": 3, "l": 2, "r": 3}

    def get_image_path(self, folder, frame_index, side):
        f_str = f"{frame_index:010d}{self.img_ext}"
        return os.path.join(
            self.data_path, folder, f"image_0{self.side_map[side]}/data", f_str
        )

    def get_depth(self, folder, frame_index, side, do_flip):
        calib_path = os.path.join(self.data_path, folder.split("/")[0])
        velo = os.path.join(
            self.data_path, folder, f"velodyne_points/data/{int(frame_index):010d}.bin"
        )
        depth = kitti_utils.generate_depth_map(calib_path, velo, self.side_map[side])
        if do_flip:
            depth = np.fliplr(depth)
        return depth

    def get_pose(self, folder, frame_index, offset):
        """OXTS speed-integrated relative displacement in the rectified cam
        frame (`kitti_dataset.py:220-243`)."""
        import datetime

        oxts_root = os.path.join(self.data_path, folder, "oxts")
        with open(os.path.join(oxts_root, "timestamps.txt")) as f:
            timestamps = np.array(
                [
                    datetime.datetime.strptime(
                        ts[:-3], "%Y-%m-%d %H:%M:%S.%f"
                    ).timestamp()
                    for ts in f.read().splitlines()
                ]
            )
        speed0 = np.genfromtxt(
            os.path.join(oxts_root, "data", f"{frame_index:010d}.txt")
        )[[8, 9, 10]]
        dt = timestamps[frame_index + offset] - timestamps[frame_index]
        displacement = speed0 * dt
        root = os.path.join(self.data_path, os.path.dirname(folder))
        imu2velo = kitti_utils.read_calib_file(
            os.path.join(root, "calib_imu_to_velo.txt")
        )
        velo2cam = kitti_utils.read_calib_file(
            os.path.join(root, "calib_velo_to_cam.txt")
        )
        cam2cam = kitti_utils.read_calib_file(
            os.path.join(root, "calib_cam_to_cam.txt")
        )
        velo2cam_mat = kitti_utils.transform_from_rot_trans(
            velo2cam["R"], velo2cam["T"]
        )
        imu2velo_mat = kitti_utils.transform_from_rot_trans(
            imu2velo["R"], imu2velo["T"]
        )
        rect = kitti_utils.transform_from_rot_trans(
            cam2cam["R_rect_00"], np.zeros(3)
        )
        imu2cam = rect @ velo2cam_mat @ imu2velo_mat
        return imu2cam[:3, :3] @ displacement + imu2cam[:3, 3]


class KITTIInpaintDataset(KITTIRawDataset):
    def post_process(self, out, rng):
        out["mask"] = make_erase_mask(
            rng, self.height, self.width, self.cfg.erase_shape, self.cfg.erase_count
        )


class KITTIMapDataset(KITTIInpaintDataset):
    """Motion masks + alpha map-params per source frame
    (`kitti_dataset.py:246-321`)."""

    def post_process(self, out, rng):
        super().post_process(out, rng)
        alphas = tuple(self.cfg.map_alphas) or (0.25, 0.5, 0.75, 1.0)
        target = out["color"][0]
        masks, params = [], []
        for i in range(1, len(self.frame_ids)):
            src = out["color"][i]
            masks.append(motion_mask(target, src))
            max_pos = len(alphas) ** 2
            gt_map = rng.randint(0, max_pos)
            ind1, ind2 = gt_map // len(alphas), gt_map % len(alphas)
            params.append([float(gt_map), alphas[ind1], alphas[ind2]])
        out["map_mask"] = np.stack(masks).astype(np.float32)
        out["map_params"] = np.asarray(params, np.float32)


class KITTIOdomDataset(MonoDataset):
    K_norm = KITTIRawDataset.K_norm

    def get_image_path(self, folder, frame_index, side):
        side_map = {"l": 0, "r": 1}
        return os.path.join(
            self.data_path,
            f"sequences/{int(folder):02d}",
            f"image_{side_map[side]}",
            f"{frame_index:06d}{self.img_ext}",
        )


class KITTIDepthDataset(KITTIRawDataset):
    """Uses the improved png GT depth maps (`kitti_dataset.py:341-371`)."""

    def get_depth(self, folder, frame_index, side, do_flip):
        from PIL import Image

        p = os.path.join(
            self.data_path,
            folder,
            f"proj_depth/groundtruth/image_0{self.side_map[side]}",
            f"{frame_index:010d}.png",
        )
        depth = Image.open(p).resize(self.full_res_shape, Image.NEAREST)
        depth = np.asarray(depth, np.float32) / 256.0
        if do_flip:
            depth = np.fliplr(depth)
        return depth


class FolderDataset(MonoDataset):
    """Plain image-directory dataset (`folder_dataset.py:20-161`)."""

    K_norm = np.array(
        [[0.9765, 0, 0.5, 0], [0, 1.736, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )

    def __init__(self, data_path, filenames=None, **kw):
        files = sorted(os.listdir(data_path))
        super().__init__(data_path, files, **kw)

    def parse_line(self, index):
        return self.filenames[index], index, None

    def get_image_path(self, folder, frame_index, side):
        idx = min(max(frame_index, 0), len(self.filenames) - 1)
        return os.path.join(self.data_path, self.filenames[idx])

    def load_frames(self, index, do_flip):
        frames = []
        for i in self.frame_ids:
            j = min(max(index + (i if i != "s" else 0), 0), len(self.filenames) - 1)
            frames.append(self._load_resized(None, j, None, do_flip))
        return frames, None


class CityscapeDataset(MonoDataset):
    """Cityscapes frame-sequence dataset backed by an LMDB store with a
    pickled key cache (`mono/datasets/cityscape_dataset.py:194-260`).
    Requires the optional `lmdb` package."""

    K_norm = np.array(
        [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "CityscapeDataset needs the optional `lmdb` package"
            ) from e
        self._env = None

    def _db(self):
        import lmdb

        if self._env is None:
            self._env = lmdb.open(
                self.data_path, readonly=True, lock=False, readahead=False
            )
        return self._env

    def _cache_key(self, folder, frame_index, side):
        return f"{folder}_{frame_index:06d}"

    def get_color(self, folder, frame_index, side, do_flip):
        import io

        from PIL import Image

        key = f"{folder}_{frame_index:06d}".encode()
        with self._db().begin() as txn:
            buf = txn.get(key)
        if buf is None:
            raise KeyError(key)
        img = Image.open(io.BytesIO(buf)).convert("RGB")
        if do_flip:
            img = img.transpose(0)
        return img


class ETH3DDataset(FolderDataset):
    K_norm = np.array(
        [[0.9832, 0, 0.5, 0], [0, 1.736, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )


class EuRoCDataset(FolderDataset):
    # fx/w, fy/h from the EuRoC cam0 calibration (euroc_dataset.py:59)
    K_norm = np.array(
        [[458.654 / 752, 0, 0.5, 0], [0, 457.296 / 480, 0.5, 0], [0, 0, 1, 0],
         [0, 0, 0, 1]],
        np.float32,
    )
