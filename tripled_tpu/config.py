"""Typed experiment configuration (replaces mmcv `Config.fromfile`).

The reference drives everything from python dict-configs
(`config/cfg_kitti_*.py`, schema in SURVEY §2.7). Here each section is a
frozen dataclass so configs are hashable / jit-static. Experiment presets
live in /root/repo/configs/*.py and build an `ExperimentConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

# frame ids: ints are temporal offsets, "s" is the opposite stereo view
FrameId = Any


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "mono_baseline"
    depth_num_layers: int = 18
    pose_num_layers: int = 18
    extractor_num_layers: int = 50
    frame_ids: tuple = (0, -1, 1)
    height: int = 192
    width: int = 640
    scales: tuple = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    # pose net always runs at this fixed resolution (mono_fm_joint/net.py:168)
    pose_height: int = 192
    pose_width: int = 640

    # loss switches / weights
    automask: bool = True
    disp_norm: bool = True
    smoothness_weight: float = 1e-3
    perception_weight: float = 1e-3
    dis: float = 1e-3
    cvt: float = 1e-3
    img_reconstruct_weight: float = 1.0

    # extractor behavior
    use_extractor: bool = False        # perceptual branch exists
    joint_extractor: bool = False      # extractor trains jointly (mono_fm_joint)
    freeze_extractor: bool = False     # stop-gradient through extractor
    use_image_decoder: bool = False    # reconstruction Decoder exists
    inpaint: bool = False              # extractor eats masked input; recon masked

    # disentangle (TripleD)
    disentangle_layers: tuple = (False, False, False, False, False)
    depth_skip_type: str | None = None       # None|'ca'|'pa'|'asca'|'1x1'
    depth_disentangle_type: str = "use_half"  # 'use_half'|'1x1'
    color_skip_type: str | None = None        # None|'1x1'
    color_skip_layers: tuple = (False, False, False, False)
    skip_connection_multiplier: float = 1.0
    auto_res_weight: float = 0.0
    use_pfp: bool = False

    # distillation heads
    d2g_weight: float = 0.0
    colorize_weight: float = 0.0
    use_normal: bool = False
    use_lab: bool = False
    use_mask: bool = False
    use_distill_mask: bool = False

    # separate-encoder distill variants
    sep_colorize: bool = False
    sep_inpaint: bool = False
    cond_encoder: bool = False
    inpaint_weight: float = 0.0
    colorize_num_layers: int = 50
    inpaint_num_layers: int = 50

    # map-pose pretext
    map_pose: bool = False
    map_output: int = 0
    map_pose_weight: float = 0.0

    # equivariant pretext
    equivariant: bool = False
    equivariant_weight: float = 0.0

    # rotation pretext (rotnet / mono_fm_joint_im_rot)
    im_rot: bool = False
    pretext_resize: int = 224
    pretext_label_size: int = 4
    pretext_weight: float = 1.0

    # decoder variants
    use_hr_depth: bool = False
    use_diffnet: bool = False
    depth_use_shuffle: bool = False
    # CRP DepthDecoder dropout on the two deepest skips
    # (mono_fm/depth_decoder.py:13-14,56-57). 0.0 for deterministic
    # trajectory-parity studies (cli/parity_compare.py --trajectory).
    depth_dropout_rate: float = 0.5

    # Warp sampling convention. The reference normalizes pixel coords by
    # (W-1, H-1) (mono_fm_joint/net.py:189-192 — the align_corners=True
    # convention) but then calls F.grid_sample with no align_corners
    # argument, which DEFAULTS TO FALSE on torch >= 1.3. True (default)
    # keeps the self-consistent exact-pixel convention; False reproduces
    # the reference-on-modern-torch behavior (a sub-pixel x*W/(W-1) - 0.5
    # shift of every sample location) for bit-parity studies.
    warp_align_corners: bool = True

    # numerics / kernels
    # 'bfloat16' = mixed precision: conv trunks (depth/extractor encoders,
    # all decoders) run bf16 with f32 master params/Adam/BN stats; losses,
    # warp geometry and the pose networks stay f32 (net.py "precision"
    # section, train/step.py _cast_floating).
    compute_dtype: str = "float32"
    # dtype of the gathered warp texels: 'bfloat16' trades ~1e-3-relative
    # sampling exactness for ~15% less gather time (BASELINE.md r3 log);
    # keep 'float32' for torch-parity work
    warp_gather_dtype: str = "float32"
    # 2x2 output-block gather: one 4x4-patch gather serves 4 output pixels
    # (4x fewer indices for the serial TPU gather engine). Exact bilinear
    # except where a block's samples spread >3 px (depth-discontinuity
    # pixels; clamped to the patch edge — ops/warp.py grid_sample_block).
    # OPT-IN speed mode; default False keeps bit-exactness vs torch.
    warp_block_gather: bool = False
    # output-block shape (bh, bw) for the block-gather warp: (2, 4) halves
    # the index count again vs (2, 2) (patch rows pad 72->128 lanes, the
    # second fast-gather width — dev/gather_bench4.py) at a wider
    # clamp-tolerance patch (5 px spread in x instead of 3)
    warp_block_shape: tuple = (2, 2)
    # apply the block gather to the 64-ch half-res feature warp too:
    # one 1024-lane patch gather per 2x2 block replaces the pairwise
    # 2x(128-lane) gathers — ~2.8x fewer gather-engine cycles (gb6), at
    # the same clamped-discontinuity approximation as the color path and
    # +1 GB/frame of patch HBM at bs16 @192x640 bf16
    warp_block_features: bool = False
    # fused Pallas photometric min-reprojection kernel (TPU only). Skips the
    # reference's 1e-5 gaussian tie-break noise on identity losses: exact
    # ties deterministically keep the identity candidate instead, which
    # serves the same automasking purpose. Default ON since the first
    # honest-clock A/B (round 3): 36.16 vs 35.49 imgs/s end-to-end on the
    # mono_fm bench config (BASELINE.md round-3 log). Parity studies run
    # on CPU where the flag is inert (TPU-only gate in net.py).
    use_pallas_photometric: bool = True
    # equality-mask backward for the CRP 5x5 maxpools instead of XLA's
    # select-and-scatter (models/layers.py:max_pool_5x5_same_eqmask).
    # Bitwise-identical gradient on tie-free input; exact within-window
    # ties route the cotangent to all tied positions instead of one.
    # OPT-IN speed mode; default False keeps the SAS path.
    pool_eqmask_grad: bool = False
    # rematerialize encoder activations in the backward pass — trades ~30%
    # extra FLOPs for the memory to fit bs≥3 at 320×1024 (SURVEY §7 hard parts)
    remat: bool = False

    def __post_init__(self):
        # normalize/validate warp_block_shape (ADVICE r3): presets may pass a
        # list; a non-positive or malformed value would otherwise crash (or
        # silently mis-reshape) deep inside the jitted warp.
        bs = tuple(self.warp_block_shape)
        if len(bs) != 2 or not all(
            isinstance(v, int) and v >= 1 for v in bs
        ):
            raise ValueError(
                f"warp_block_shape must be two positive ints, got "
                f"{self.warp_block_shape!r}"
            )
        object.__setattr__(self, "warp_block_shape", bs)

    @property
    def num_frames(self) -> int:
        return len(self.frame_ids)

    @property
    def source_indices(self) -> tuple:
        """Positional indices of non-target frames in stacked inputs."""
        return tuple(range(1, len(self.frame_ids)))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    name: str = "kitti"
    split: str = "exp"
    height: int = 192
    width: int = 640
    frame_ids: tuple = (0, -1, 1)
    in_path: str = ""
    gt_depth_path: str = ""
    png: bool = True
    stereo_scale: bool = False
    # inpaint masks
    erase_shape: tuple = (16, 16)
    erase_count: int = 0
    # map-pose
    map_alphas: tuple = ()
    # emit per-frame Lab conversions of the resized frames
    # (`mono_dataset.py:104-109` add_lab option)
    add_lab: bool = False
    # loader
    batch_size: int = 12
    shuffle: bool = True
    seed: int = 1024
    # in-RAM cache of decoded+resized frames (uint8, lossless), in MB;
    # 0 = off. From epoch 2 the host pipeline skips JPEG/PNG decode +
    # Lanczos resize entirely — on this 1-core host decode (~38 imgs/s
    # @192x640) otherwise rate-limits the TPU step (BASELINE.md round 3).
    # Env override: TRIPLED_DECODE_CACHE_MB.
    decode_cache_mb: int = 0
    # synthesize color_aug on device from per-sample jitter factors
    # (ops/jitter.py) instead of numpy on the 1-core host: ~halves both
    # host sample-assembly time and host->device transfer. Same factor
    # distribution / rng stream as the host path.
    device_color_aug: bool = False
    # ship frames to the device as uint8 and divide by 255 on-chip
    # (net.py converts any uint8 `color`/`color_aug` input): 4x smaller
    # host->device transfer and no host float conversion. NUMERICALLY
    # EXACT vs the reference: PIL resize outputs uint8, so the reference's
    # ToTensor inputs always sit on the uint8/255 grid
    # (mono_dataset.py:118-127). Training requires device_color_aug=True
    # (the host ColorJitter path needs float frames).
    ship_uint8: bool = False


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip_norm: float = 35.0
    warmup_iters: int = 500
    warmup_ratio: float = 1.0 / 3.0
    lr_steps: tuple = (20, 30)   # epochs
    lr_gamma: float = 0.5
    total_epochs: int = 40
    # paramwise options (`mono/apis/trainer.py:77-144`): multipliers applied
    # to non-norm biases (lr / weight decay) and norm-layer weight decay
    bias_lr_mult: float = 1.0
    bias_decay_mult: float = 1.0
    norm_decay_mult: float = 1.0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    optim: OptimConfig = OptimConfig()
    work_dir: str = "work_dir"
    seed: int = 1024
    validate: bool = True
    validate_interval: int = 1
    checkpoint_interval: int = 1
    log_interval: int = 50
    resume_from: str | None = None
    finetune: str | None = None
    load_from: str | None = None


def load_config(path: str) -> ExperimentConfig:
    """Execute a python config file that defines `config: ExperimentConfig`."""
    import importlib.util
    import os
    import sys

    cfg_dir = os.path.dirname(os.path.abspath(path))
    spec = importlib.util.spec_from_file_location("_experiment_config", path)
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, cfg_dir)  # allow `from _common import ...` siblings
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(cfg_dir)
    cfg = getattr(mod, "config")
    assert isinstance(cfg, ExperimentConfig), f"{path} must define `config`"
    return cfg


def dump_config(cfg: ExperimentConfig, path: str) -> None:
    import pprint

    with open(path, "w") as f:
        f.write(pprint.pformat(dataclasses.asdict(cfg), width=100))
