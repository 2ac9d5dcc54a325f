"""TripleDNet-family unified model (flax.linen).

The reference implements 13 model variants as a 4-deep inheritance diamond
(`mono/model/*/net.py`; see SURVEY §2.3). Here there is ONE module whose
`ModelConfig` flags select submodules and loss terms — the variants become
config presets (`tripled_tpu/models/registry.py`), not classes.

Inputs are a flat dict of stacked arrays (frame axis F follows
`cfg.frame_ids` order; index 0 is the target frame):
  color      (B, F, H, W, 3)   un-augmented frames
  color_aug  (B, F, H, W, 3)   photometrically augmented frames
  K, inv_K   (B, 4, 4)
  mask       (B, H, W, 1)      inpaint erase mask (1 = keep), optional
  stereo_T   (B, 4, 4)         when "s" ∈ frame_ids
  map_mask   (B, F-1, H, W, 1) motion masks (map-pose variant)
  map_params (B, F-1, 3)       (label, alpha1, alpha2) per source frame

Train call returns (outputs, loss_dict); every loss_dict entry is a scalar
(the reference means each entry then sums — `mono/apis/trainer.py:36-46`).
Eval call returns the 4-scale disparity list [s0..s3].

Parity notes (reference file:line cited per loss in the code):
- the per-scale min-reprojection / automask / smoothness chain follows
  `mono/model/mono_fm_joint/net.py:73-155`;
- the perceptual (feature-metric) branch warps extractor stage-0 features at
  H/2 (`net.py:196-223`); computed once — the reference recomputes the same
  scale-0 value in every scale iteration and divides by len(scales), which
  sums to the same number;
- the equivariant variant's mask warp uses the reference's (K, inv_K)
  argument order verbatim (`mono_fm_joint_inpaint/net.py:651-653`), a quirk
  kept for parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tripled_tpu.config import ModelConfig
from tripled_tpu.models.decoders import ColorDecoder, ImageDecoder
from tripled_tpu.models.depth_decoder import DepthDecoder
from tripled_tpu.models.encoders import DepthEncoder, Extractor, PoseEncoder
from tripled_tpu.models.layers import (
    AdaptivelyScaledCALayer,
    BatchNorm,
    CALayer,
    Conv1x1,
    identity_partial,
)
from tripled_tpu.models.pose_decoder import PoseDecoder
from tripled_tpu.models.resnet import BasicBlock, stage_channels
from tripled_tpu.ops import (
    disp_to_depth,
    grid_sample,
    grid_sample_block,
    invert_intrinsics,
    reprojection_loss,
    rgb2lab,
    rgb_to_gray,
    rgb_to_l,
    scale_intrinsics,
    smooth_loss,
    feature_regularization_loss,
    min_reprojection_with_automask,
    perceptional_loss,
    transformation_from_parameters,
    warp_coords,
)
from tripled_tpu.ops.image import resize_bilinear

# channel width up to which a warped tensor is treated as "color" (RGB /
# RGBA / single-channel masks) by the block-gather dispatch in _grid_sample
_COLOR_WARP_MAX_CH = 4


class _SkipSplit(nn.Module):
    """One disentangle skip layer: optional attention, then channel split
    (`mono_fm_joint_inpaint/net.py:402-441`)."""

    channels: int
    attention: Optional[str] = None  # 'ca' | 'pa' | 'asca' | None
    split: Optional[str] = None      # 'use_half' (left) | '1x1' | None
    full_1x1: bool = False           # non-split 1x1+BN+ELU (last-stage option)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.attention == "ca":
            x = CALayer(self.channels)(x)
        elif self.attention == "pa":
            x = CALayer(self.channels, pix_att=True)(x)
        elif self.attention == "asca":
            x = AdaptivelyScaledCALayer(self.channels)(x)
        if self.split == "use_half":
            x = identity_partial(x, 2, use_right=False)
        elif self.split == "1x1":
            x = Conv1x1(self.channels // 2)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.elu(x)
        elif self.full_1x1:
            x = Conv1x1(self.channels)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.elu(x)
        return x


class _DistillHead(nn.Module):
    """BasicBlock(in→32) + 1×1 conv head used by the grayscale / colorize
    distillation branches (`mono_fm_joint_inpaint/net.py:141-144,213-219`)."""

    out_channels: int
    use_residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = BasicBlock(32, use_residual=self.use_residual)(x, train=train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True)(x)


class TripleDNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.use_diffnet:
            from tripled_tpu.models.hrnet import HRNetFeatures

            # DIFFNet feeds the HRNet raw [0,1] images (no 0.45/0.225 norm —
            # diffnet_encoder.py has no normalization, unlike depth_encoder.py)
            self.depth_encoder = HRNetFeatures(c.depth_num_layers)
            enc_ch = self.depth_encoder.num_ch_enc
        else:
            self.depth_encoder = DepthEncoder(c.depth_num_layers, remat=c.remat)
            enc_ch = stage_channels(c.depth_num_layers)

        self._disentangled = any(c.disentangle_layers)
        if c.use_diffnet and self._disentangled:
            # the reference combination is broken too: its disentangle
            # forward indexes the 5 flat skips into HRNet's nested feature
            # lists (mono_fm_joint/net.py:37-38 + inpaint/net.py:398-460)
            raise ValueError("use_diffnet cannot be combined with disentangle")
        # depth skip layers
        skips = []
        depth_ch = []
        for ind, flag in enumerate(c.disentangle_layers):
            ch = enc_ch[ind]
            att = c.depth_skip_type if c.depth_skip_type in ("ca", "pa", "asca") else None
            if flag:
                split = c.depth_disentangle_type
                skips.append(_SkipSplit(ch, attention=att, split=split))
                depth_ch.append(ch // 2)
            else:
                full_1x1 = (
                    c.depth_skip_type == "1x1"
                    and ind == len(c.disentangle_layers) - 1
                )
                skips.append(_SkipSplit(ch, attention=att, full_1x1=full_1x1))
                depth_ch.append(ch)
        self.depth_skips = skips
        if c.use_diffnet:
            from tripled_tpu.models.hr_decoders import DIFFDepthDecoder

            self.depth_decoder = DIFFDepthDecoder(tuple(enc_ch))
        elif c.use_hr_depth:
            from tripled_tpu.models.hr_decoders import HRDepthDecoder

            self.depth_decoder = HRDepthDecoder(tuple(depth_ch))
        else:
            depth_decoder_cls = (
                nn.remat(DepthDecoder, static_argnums=(2,))
                if c.remat else DepthDecoder
            )
            self.depth_decoder = depth_decoder_cls(
                tuple(depth_ch),
                use_shuffle=c.depth_use_shuffle,
                dropout_rate=c.depth_dropout_rate,
                eqmask_pool=c.pool_eqmask_grad,
            )

        self.pose_encoder = PoseEncoder(c.pose_num_layers, 2, remat=c.remat)
        self.pose_decoder = PoseDecoder()

        if c.use_extractor:
            self.extractor = Extractor(c.extractor_num_layers, remat=c.remat)
        # With remat on, rematerialize the thin full-resolution decoders
        # too: their 16/32-channel @HxW activations are where XLA's
        # remat-compression copies pad catastrophically (up to 10.7x layout
        # expansion at 320x1024 — see BASELINE.md round-2 notes), and
        # recomputing a thin decoder is far cheaper than storing it.
        image_decoder_cls = nn.remat(ImageDecoder) if c.remat else ImageDecoder
        color_decoder_cls = nn.remat(ColorDecoder) if c.remat else ColorDecoder
        if c.use_image_decoder:
            self.image_decoder = image_decoder_cls(3)

        # color branch (disentangle)
        if self._disentangled and (c.auto_res_weight > 0 or c.use_pfp):
            color_ch = []
            if c.color_skip_type == "1x1":
                color_skips = []
                for ind, flag in enumerate(c.color_skip_layers):
                    if flag:
                        color_skips.append(_SkipSplit(enc_ch[ind], split="1x1"))
                        color_ch.append(enc_ch[ind] // 2)
                    else:
                        color_skips.append(_SkipSplit(enc_ch[ind]))
                        color_ch.append(enc_ch[ind])
                color_skips.append(_SkipSplit(enc_ch[-1]))
                color_ch.append(enc_ch[-1])
                self.color_skips = color_skips
            else:
                color_ch = [
                    ch // 2 if flag else ch
                    for ch, flag in zip(enc_ch, c.disentangle_layers)
                ]
            self.color_decoder = color_decoder_cls(
                3,
                skip_connection_multiplier=c.skip_connection_multiplier,
                skip_layers=tuple(bool(s) for s in c.color_skip_layers),
            )

        # distillation heads
        if c.d2g_weight > 0:
            in_ch = 2 if c.use_normal else 1
            self.depth_to_gray = _DistillHead(1, use_residual=not c.use_normal)
        if c.colorize_weight > 0 and not c.sep_colorize:
            self.colorize_net = _DistillHead(2, use_residual=False)

        # separate-encoder distill variants
        if c.sep_colorize:
            self.colorize_encoder = Extractor(c.colorize_num_layers)
            self.colorize_decoder = color_decoder_cls(
                2, skip_connection_multiplier=c.skip_connection_multiplier
            )
        if c.sep_inpaint:
            self.inpaint_encoder = Extractor(c.inpaint_num_layers)
            self.inpaint_decoder = color_decoder_cls(
                3, skip_connection_multiplier=c.skip_connection_multiplier
            )

        if c.map_pose:
            self.pose_map_cls = nn.Dense(c.map_output)

        if c.im_rot:
            self.rot_head = nn.Dense(c.pretext_label_size)

    # ------------------------------------------------------------- precision

    # Mixed precision (cfg.compute_dtype='bfloat16'): the conv networks run
    # in bf16 (params are cast per-step by make_train_step; inputs are cast
    # at each encoder entry via _cd), while everything precision-critical —
    # warp coordinate geometry, disparity→depth, every loss reduction, BN
    # statistics (flax computes those in f32 regardless), Adam state — stays
    # f32 via a cast back at each network boundary (_f32). bf16's 2^-8
    # relative rounding on disp/pose outputs moves warp sample locations by
    # ~0.01 px at typical KITTI flows; keep float32 for parity studies.

    def _cd(self, x):
        if self.cfg.compute_dtype == "bfloat16":
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                x,
            )
        return x

    def _f32(self, x):
        if self.cfg.compute_dtype == "bfloat16":
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if a.dtype == jnp.bfloat16
                else a,
                x,
            )
        return x

    # ------------------------------------------------------------------ forward

    def __call__(self, inputs: Dict[str, Any], train: bool = True):
        c = self.cfg
        # DataConfig.ship_uint8: frames arrive as uint8 and are normalized
        # here, on-chip (4x smaller host->device transfer; exactly the
        # uint8/255 grid the reference's post-PIL-resize ToTensor sees)
        for key in ("color", "color_aug"):
            if key in inputs and inputs[key].dtype == jnp.uint8:
                inputs = dict(
                    inputs,
                    **{key: inputs[key].astype(jnp.float32) / 255.0},
                )
        if train and "jitter_params" in inputs:
            # device-side ColorJitter (DataConfig.device_color_aug): the
            # pipeline ships 9 floats/sample instead of a second image set
            from tripled_tpu.ops.jitter import color_jitter

            inputs = dict(
                inputs,
                color_aug=color_jitter(
                    inputs["color"], inputs["jitter_params"]
                ),
            )
        scene = self.depth_encoder(self._cd(inputs["color_aug"][:, 0]), train=train)
        if c.use_diffnet:
            # HRNet yields the nested DIFFNet feature structure
            # (hrnet.py docstring); no skip layers apply — diffnet is never
            # disentangled (see setup)
            depth_emb = scene
        else:
            depth_emb = [
                skip(f, train=train) for skip, f in zip(self.depth_skips, scene)
            ]
        # positional `train`: the remat wrapper's static_argnums can't see
        # kwargs (jax.checkpoint semantics)
        disps = self._f32(self.depth_decoder(depth_emb, train))

        if not train:
            return disps

        outputs: Dict[str, Any] = {"disps": disps}

        # ---- color branch (disentangle)
        if self._disentangled and (c.auto_res_weight > 0 or c.use_pfp):
            if c.color_skip_type == "1x1":
                color_emb = [
                    skip(f, train=train) for skip, f in zip(self.color_skips, scene)
                ]
            else:
                color_emb = [
                    identity_partial(f, 2, use_right=True) if flag else f
                    for f, flag in zip(scene, c.disentangle_layers)
                ]
            outputs["auto_res"] = self._f32(
                self.color_decoder(color_emb, self._cd(disps))
            )

        # ---- poses
        pose_feats0 = None
        if c.use_pfp and "auto_res" in outputs:
            pose_feats0 = resize_bilinear(
                outputs["auto_res"][0], c.pose_height, c.pose_width
            )
        outputs.update(self._predict_poses(inputs, pose_feats0))

        # ---- extractor branch
        features = None
        if c.im_rot:
            # rotation pretext (`mono_fm_joint_im_rot/net.py:41-49`): the
            # extractor sees a rotated random crop; its features also feed the
            # regularization loss.
            from tripled_tpu.models.aux_nets import random_crop, random_rotate_batch

            target = inputs["color"][:, 0]
            crop, (ri, rj) = random_crop(
                self.make_rng("crop"), target, c.pretext_resize
            )
            rotated, labels = random_rotate_batch(self.make_rng("rotation"), crop)
            features = self._f32(self.extractor(self._cd(rotated), train=train))
            logits = self._f32(
                self.rot_head(self._cd(jnp.mean(features[-1], axis=(1, 2))))
            )
            outputs["rot_predicts"] = logits
            outputs["rot_gt"] = labels
            outputs["crop_offset"] = (ri, rj)
        elif c.use_extractor:
            target = inputs["color"][:, 0]
            # Only the base inpaint forward masks the extractor input
            # (`mono_fm_joint_inpaint/net.py:40`); every `disentangle`
            # subclass (incl. the sep_* ones) overrides forward and feeds
            # the UNmasked target (`net.py:305,371,513`).
            masked_ext = c.inpaint and "disentangle" not in c.name
            if masked_ext and "mask" in inputs:
                ext_in = target * inputs["mask"]
            else:
                ext_in = target
            features = self.extractor(self._cd(ext_in), train=train)
            if c.freeze_extractor:
                features = [jax.lax.stop_gradient(f) for f in features]
            if c.use_image_decoder and c.img_reconstruct_weight != 0:
                outputs["res_imgs"] = self._f32(self.image_decoder(features))
            features = self._f32(features)

        # ---- separate distill branches
        if c.sep_colorize:
            lab = rgb2lab(inputs["color"][:, 0])
            gt_ab = lab[..., 1:]
            gs = jnp.broadcast_to(lab[..., 0:1], lab.shape[:3] + (3,))
            cond = depth_emb if c.cond_encoder else None
            gs_emb = self.colorize_encoder(gs, cond, train=train)
            outputs["sep_colorize"] = self.colorize_decoder(gs_emb, disps)
            outputs["gt_ab"] = gt_ab
        if c.sep_inpaint:
            masked = inputs["color"][:, 0] * inputs["mask"]
            cond = depth_emb if c.cond_encoder else None
            inp_emb = self.inpaint_encoder(masked, cond, train=train)
            outputs["sep_inpaint"] = self.inpaint_decoder(inp_emb, disps)

        loss_dict = self._compute_losses(inputs, outputs, features, train)
        return outputs, loss_dict

    # ------------------------------------------------------------------ poses

    def predict_pose(self, img_pair, train: bool = False):
        """Standalone pose inference for odometry eval: img_pair is the
        channel-concatenated (prev, cur) frames (B, H, W, 6); returns
        (axisangle (B,1,1,3), translation (B,1,1,3)) — the
        `scripts/eval_pose.py:55-62` path."""
        feats = self.pose_encoder(img_pair, train=train)
        return self.pose_decoder(feats[-1])

    def _pose_pair(self, a, b):
        feats = self.pose_encoder(jnp.concatenate([a, b], axis=-1), train=True)
        return self.pose_decoder(feats[-1]), feats[-1]

    def _predict_poses(self, inputs, pose_feat_target=None):
        """Per source frame: PoseEncoder on the (temporally ordered) frame
        pair at the fixed pose resolution (`mono_fm_joint/net.py:164-179`)."""
        c = self.cfg
        ph, pw = c.pose_height, c.pose_width

        def at_pose_res(x):
            return resize_bilinear(x, ph, pw)

        tgt = (
            pose_feat_target
            if pose_feat_target is not None
            else at_pose_res(inputs["color_aug"][:, 0])
        )

        out: Dict[str, Any] = {"cam_T_cam": {}, "map_logits": {}}
        for i, f_i in enumerate(c.frame_ids[1:], start=1):
            if f_i == "s":
                continue
            src = at_pose_res(inputs["color_aug"][:, i])
            tgt_i = tgt
            if c.map_pose:
                mm = at_pose_res(inputs["map_mask"][:, i - 1])
                mp = inputs["map_params"][:, i - 1]
                a1 = mp[:, 1].reshape(-1, 1, 1, 1)
                a2 = mp[:, 2].reshape(-1, 1, 1, 1) if mp.shape[1] > 2 else a1
                src = src * mm * a1 + src * (1 - mm)
                tgt_i = tgt * mm * a2 + tgt * (1 - mm)
            pair = (src, tgt_i) if f_i < 0 else (tgt_i, src)
            (axisangle, translation), bottom = self._pose_pair(*pair)
            T = transformation_from_parameters(
                axisangle[:, 0], translation[:, 0], invert=(f_i < 0)
            )
            out["cam_T_cam"][i] = T
            if c.map_pose:
                pooled = jnp.mean(bottom, axis=(1, 2))
                out["map_logits"][i] = self.pose_map_cls(pooled)
        return out

    # ------------------------------------------------------------------ warps

    def _frame_T(self, inputs, outputs, i, f_i):
        if f_i == "s":
            return inputs["stereo_T"]
        return outputs["cam_T_cam"][i]

    def _grid_sample(self, img, coords, method: str = "bilinear"):
        """grid_sample honoring cfg.warp_align_corners.

        The reference normalizes by (W-1, H-1) then calls F.grid_sample
        with the torch>=1.3 default align_corners=False
        (mono_fm_joint/net.py:189-193); that composition samples at
        x*W/(W-1) - 0.5 instead of x. warp_align_corners=False reproduces
        it exactly for parity studies; True (default) keeps exact pixel
        coordinates."""
        if not self.cfg.warp_align_corners:
            h, w = img.shape[1], img.shape[2]
            scale = jnp.asarray([w / (w - 1.0), h / (h - 1.0)], coords.dtype)
            coords = coords * scale - 0.5
        gd = (
            jnp.bfloat16
            if self.cfg.warp_gather_dtype == "bfloat16"
            else None
        )
        c = img.shape[-1]
        # color-vs-feature warp split: at most _COLOR_WARP_MAX_CH channels
        # counts as a "color" warp and uses cfg.warp_block_shape; wider
        # tensors (the 64-ch perceptual features) are only block-gathered
        # when cfg.warp_block_features is set, and stay at 2x2 so patch
        # rows cap at 1024 lanes
        if (
            self.cfg.warp_block_gather
            and method == "bilinear"
            and (
                c <= _COLOR_WARP_MAX_CH
                or (self.cfg.warp_block_features and c <= 64)
            )
        ):
            bh, bw = (
                self.cfg.warp_block_shape
                if c <= _COLOR_WARP_MAX_CH
                else (2, 2)
            )
            if coords.shape[1] % bh == 0 and coords.shape[2] % bw == 0:
                # bh*bw fewer gather indices; exact except at wide-spread
                # discontinuities (ops/warp.py grid_sample_block docstring)
                return grid_sample_block(
                    img, coords, gather_dtype=gd, block=(bh, bw)
                )
        return grid_sample(img, coords, method=method, gather_dtype=gd)

    def _warp_colors(self, inputs, outputs, disp):
        """Backward-warp each source frame into the target view
        (`mono_fm_joint/net.py:181-194`). Returns list over source frames."""
        c = self.cfg
        disp = resize_bilinear(disp, c.height, c.width)
        _, depth = disp_to_depth(disp, c.min_depth, c.max_depth)
        warped = []
        for i, f_i in enumerate(c.frame_ids[1:], start=1):
            T = self._frame_T(inputs, outputs, i, f_i)
            coords = warp_coords(depth, inputs["inv_K"], inputs["K"], T)
            warped.append(self._grid_sample(inputs["color"][:, i], coords))
        return warped

    def _warp_features(self, inputs, outputs, disp0, train):
        """Warp extractor stage-0 features of each source frame at H/2
        (`mono_fm_joint/net.py:196-223`)."""
        c = self.cfg
        h2, w2 = c.height // 2, c.width // 2
        disp = resize_bilinear(disp0, h2, w2)
        _, depth = disp_to_depth(disp, c.min_depth, c.max_depth)
        K2 = scale_intrinsics(inputs["K"], 0.5, 0.5)
        inv_K2 = invert_intrinsics(K2)
        feats = []
        for i, f_i in enumerate(c.frame_ids[1:], start=1):
            T = self._frame_T(inputs, outputs, i, f_i)
            coords = warp_coords(depth, inv_K2, K2, T)
            src_f = self.extractor(inputs["color"][:, i], train=train)[0]
            if c.freeze_extractor:
                src_f = jax.lax.stop_gradient(src_f)
            # under bf16 compute, warp the features in bf16: the gather
            # texels are bf16 anyway (warp_gather_dtype), but an f32
            # source built the 4-corner patch tensor in f32 — measured at
            # ~10 GB/step of avoidable HBM traffic (dev/byte_ledger.py).
            # The perceptional loss upcasts to f32 at its reduction.
            feats.append(self._grid_sample(self._cd(src_f), coords))
        return feats

    def _warp_features_cropped(self, inputs, outputs, disp0, offset, train):
        """im_rot perceptual branch: warp extractor features of the matching
        random crop of each source frame (`im_rot/net.py:130-164`). The K/2
        scaling without a crop-offset correction mirrors the reference."""
        c = self.cfg
        ri, rj = offset
        size = c.pretext_resize
        b = disp0.shape[0]
        disp = resize_bilinear(disp0, c.height, c.width)
        disp = jax.lax.dynamic_slice(disp, (0, ri, rj, 0), (b, size, size, 1))
        disp = resize_bilinear(disp, size // 2, size // 2)
        _, depth = disp_to_depth(disp, c.min_depth, c.max_depth)
        K2 = scale_intrinsics(inputs["K"], 0.5, 0.5)
        inv_K2 = invert_intrinsics(K2)
        feats = []
        for i, f_i in enumerate(c.frame_ids[1:], start=1):
            T = self._frame_T(inputs, outputs, i, f_i)
            coords = warp_coords(depth, inv_K2, K2, T)
            src = jax.lax.dynamic_slice(
                inputs["color"][:, i], (0, ri, rj, 0), (b, size, size, 3)
            )
            src_f = self.extractor(src, train=train)[0]
            feats.append(self._grid_sample(self._cd(src_f), coords))
        return feats

    # ------------------------------------------------------------------ losses

    def _compute_losses(self, inputs, outputs, features, train):
        c = self.cfg
        n_scales = len(c.scales)
        target = inputs["color"][:, 0]
        mask = inputs.get("mask")
        loss_dict: Dict[str, jnp.ndarray] = {}

        # feature regularization (joint extractor only) — net.py:77-80
        if features is not None and c.joint_extractor:
            for i, f in enumerate(features):
                # bf16 compute: feature-space loss elementwise in bf16
                # (reductions stay f32 inside the op) — halves the
                # flagship's loss fwd/bwd HBM bytes (r5 byte ledger)
                loss_dict[f"feature_regularization_loss/{i}"] = (
                    feature_regularization_loss(
                        self._cd(f), target, c.dis, c.cvt
                    )
                    / (2**i)
                    / 5.0
                )

        # min perceptional loss — net.py:130-140 / inpaint net.py:59-70.
        # The equivariant variant's compute_losses override omits this term
        # (`mono_fm_joint_inpaint/net.py:690-783`).
        if features is not None and c.perception_weight > 0 and not c.equivariant:
            if c.im_rot:
                # crop-matched perceptual branch (`im_rot/net.py:109-164`)
                ri, rj = outputs["crop_offset"]
                b = target.shape[0]
                tgt_crop = jax.lax.dynamic_slice(
                    target, (0, ri, rj, 0), (b, c.pretext_resize, c.pretext_resize, 3)
                )
                tgt_f = self.extractor(tgt_crop, train=train)[0]
                warped_feats = self._warp_features_cropped(
                    inputs, outputs, outputs["disps"][0], (ri, rj), train
                )
            else:
                tgt_f = features[0]
                warped_feats = self._warp_features(
                    inputs, outputs, outputs["disps"][0], train
                )
            # bf16 compute: both operands bf16 so the Charbonnier stays
            # bf16 (warped_feats already are); the channel-mean reduces
            # f32 inside perceptional_loss
            tgt_f = self._cd(tgt_f)
            percep = [perceptional_loss(tgt_f, sf) for sf in warped_feats]
            min_percep = jnp.min(jnp.concatenate(percep, axis=-1), axis=-1)
            loss_dict["min_perceptional_loss"] = (
                c.perception_weight * min_percep.mean()
            )

        # rotation pretext CE — `im_rot/net.py:61`
        if c.im_rot:
            from tripled_tpu.models.aux_nets import _cross_entropy_with_batch_softmax

            loss_dict["ssl_rot_loss"] = (
                _cross_entropy_with_batch_softmax(
                    outputs["rot_predicts"], outputs["rot_gt"]
                )
                * c.pretext_weight
            )

        # equivariant variant pre-computation
        if c.equivariant:
            eq = self._equivariant_outputs(inputs, outputs, train)
        else:
            eq = None

        for s in c.scales:
            disp = outputs["disps"][s]

            # image reconstruction — joint net.py:94-98 / inpaint net.py:80-91
            if "res_imgs" in outputs and c.img_reconstruct_weight != 0:
                res = outputs["res_imgs"][s]
                h, w = res.shape[1], res.shape[2]
                tgt_r = resize_bilinear(target, h, w)
                rec = reprojection_loss(res, tgt_r)
                if c.inpaint and mask is not None:
                    m_r = resize_bilinear(mask, h, w)
                    rec = jnp.sum(rec * (1 - m_r)) / jnp.sum(1 - m_r)
                else:
                    rec = rec.mean()
                loss_dict[f"img_reconstruct_loss/{s}"] = (
                    rec / n_scales * c.img_reconstruct_weight
                )

            # photometric min-reprojection with automask — net.py:101-128
            warped = self._warp_colors(inputs, outputs, disp)
            from tripled_tpu.ops.pallas import photometric as _pp

            # kernel slab dtype follows the compute dtype: under bf16
            # compute the warped texels are already bf16-sourced, and f32
            # slabs would DOUBLE the kernel HBM traffic (round-5 byte
            # ledger: the f32 slabs were 18.7 GB/step of the headline's
            # 182 GB — dev/byte_ledger.py) — beyond the f32 stack
            # promotion the identity input frames used to cause. f32
            # slabs are the parity configuration (f32 compute). bf16
            # slabs also halve Mosaic's scoped-VMEM staging, which is
            # what unlocks the flagship 320x1024 (supports_shape note 2).
            _pk_bf16 = c.compute_dtype == "bfloat16" and _pp.supports_shape(
                c.height, c.width, 2
            )
            _pk_f32 = not _pk_bf16 and _pp.supports_shape(c.height, c.width, 4)
            if (
                c.use_pallas_photometric
                and jax.default_backend() == "tpu"
                and (_pk_f32 or _pk_bf16)
            ):
                # fused Pallas kernel over all candidate images; exact ties
                # resolve to the identity candidates (listed first), which
                # replaces the reference's 1e-5 tie-break noise
                cand_imgs = []
                if c.automask:
                    cand_imgs += [
                        inputs["color"][:, i]
                        for i in range(1, len(c.frame_ids))
                    ]
                n_id = len(cand_imgs)
                cand_imgs += warped
                from tripled_tpu.ops.pallas import fused_min_reprojection

                preds_k = jnp.stack(cand_imgs, axis=1)
                tgt_k = target
                if _pk_bf16:
                    preds_k = preds_k.astype(jnp.bfloat16)
                    tgt_k = target.astype(jnp.bfloat16)
                # gradient pruning: identity candidates and the target are
                # raw input frames — their cotangents flow nowhere, so the
                # backward kernel only computes dp for the warped ones
                min_rec, _ = fused_min_reprojection(
                    tgt_k,
                    preds_k,
                    16,
                    False,
                    tuple(range(n_id, len(cand_imgs))),
                    False,
                )
            else:
                preds = [reprojection_loss(p, target) for p in warped]
                idents = []
                if c.automask:
                    idents = [
                        reprojection_loss(inputs["color"][:, i], target)
                        for i in range(1, len(c.frame_ids))
                    ]
                rng = (
                    self.make_rng("automask") if (c.automask and train) else None
                )
                min_rec = min_reprojection_with_automask(preds, idents, rng)
            loss_dict[f"min_reconstruct_loss/{s}"] = min_rec.mean() / n_scales

            # equivariant loss — mono_fm_joint_inpaint/net.py:750-767
            if eq is not None:
                eq_losses = []
                for i in range(1, len(c.frame_ids)):
                    res = eq["res_imgs"][i][s]
                    h, w = res.shape[1], res.shape[2]
                    tgt_r = resize_bilinear(inputs["color"][:, i], h, w)
                    m_r = resize_bilinear(eq["masks"][i][s], h, w)
                    l = reprojection_loss(res, tgt_r)
                    num = jnp.sum(l * (1 - m_r))
                    denom = jnp.sum(1 - m_r)
                    # the reference divides by sum(1-mask) unguarded
                    # (`mono_fm_joint_inpaint/net.py:761`) and NaNs when a
                    # garbage early-training warp drags the whole mask to 1
                    # (surfaced by the r5 torch-default init, whose healthy
                    # disp actually moves the warp); a vacuous frame
                    # contributes 0 instead (same policy as the r2
                    # smooth_loss degenerate-map guard)
                    eq_losses.append(
                        jnp.where(denom > 0, num, 0.0)
                        / jnp.maximum(denom, 1.0)
                    )
                min_eq = jnp.min(jnp.stack(eq_losses))
                loss_dict[f"min_equivariant_loss/{s}"] = (
                    c.equivariant_weight * min_eq / n_scales
                )

            # smoothness — net.py:145-153
            if c.disp_norm:
                mean_disp = disp.mean(axis=(1, 2), keepdims=True)
                disp = disp / (mean_disp + 1e-7)
            loss_dict[f"smooth_loss/{s}"] = (
                c.smoothness_weight * smooth_loss(disp, target) / (2**s) / n_scales
            )

        # auto-res (disentangle) — inpaint net.py:520-527
        if c.auto_res_weight > 0 and "auto_res" in outputs:
            loss_dict["auto_res_loss"] = (
                perceptional_loss(target, outputs["auto_res"][0]).mean()
                * c.auto_res_weight
            )

        # grayscale distillation — inpaint net.py:158-183
        if c.d2g_weight > 0:
            loss_dict["depth_to_gray_loss"] = self._distill_gs_loss(
                inputs, outputs, train
            )

        # colorization distillation — inpaint net.py:225-252
        if c.colorize_weight > 0 and not c.sep_colorize:
            loss_dict["colorize_loss"] = self._distill_colorize_loss(
                inputs, outputs, train
            )

        # separate colorize / inpaint decoders — inpaint net.py:312-323,378-389
        if c.sep_colorize and c.colorize_weight > 0:
            l = perceptional_loss(outputs["gt_ab"], outputs["sep_colorize"][0])
            if c.use_distill_mask and mask is not None:
                l = jnp.sum(l * (1 - mask)) / jnp.sum(1 - mask)
            else:
                l = l.mean()
            loss_dict["distill_colorize_loss"] = l * c.colorize_weight
        if c.sep_inpaint and c.inpaint_weight > 0:
            l = perceptional_loss(target, outputs["sep_inpaint"][0])
            if c.use_distill_mask and mask is not None:
                l = jnp.sum(l * (1 - mask)) / jnp.sum(1 - mask)
            else:
                l = l.mean()
            loss_dict["distill_inpaint_loss"] = l * c.inpaint_weight

        # map-pose classification — inpaint net.py:619-628
        if c.map_pose and c.map_pose_weight > 0:
            for i in range(1, len(c.frame_ids)):
                if c.frame_ids[i] == "s":
                    continue
                logits = outputs["map_logits"][i]
                labels = inputs["map_params"][:, i - 1, 0].astype(jnp.int32)
                ce = -jnp.take_along_axis(
                    jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1
                ).mean()
                loss_dict[f"map_pose_loss/{i}"] = ce * c.map_pose_weight

        return loss_dict

    # ------------------------------------------------------------------ distill

    def _full_res_disp(self, outputs):
        c = self.cfg
        return resize_bilinear(outputs["disps"][0], c.height, c.width)

    def _surface_normal(self, disp):
        """(normal+1)/2 from depth gradients (`inpaint net.py:149-156`)."""
        c = self.cfg
        _, depth = disp_to_depth(disp, c.min_depth, c.max_depth)
        d = depth[..., 0]
        dy, dx = jnp.gradient(d, axis=(1, 2))
        normal = jnp.stack([-dx, -dy, jnp.ones_like(d)], axis=-1)
        n = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        return (normal / n + 1.0) / 2.0

    def _distill_gs_loss(self, inputs, outputs, train):
        c = self.cfg
        disp = self._full_res_disp(outputs)
        if c.use_normal:
            disp = self._surface_normal(disp)[..., :2]
        target = inputs["color"][:, 0]
        gt_gray = rgb_to_l(target) if c.use_lab else rgb_to_gray(target)
        mask = inputs.get("mask")
        if c.use_mask and mask is not None:
            m = mask[..., :2] if c.use_normal else mask[..., :1]
            pred = self.depth_to_gray(disp * m, train=train)
            l = perceptional_loss(gt_gray, pred)
            l = jnp.sum(l * (1 - m)) / jnp.sum(1 - m)
        else:
            pred = self.depth_to_gray(disp, train=train)
            l = perceptional_loss(gt_gray, pred).mean()
        return l * c.d2g_weight

    def _distill_colorize_loss(self, inputs, outputs, train):
        c = self.cfg
        disp = self._full_res_disp(outputs)
        if c.use_normal:
            disp = jnp.concatenate([disp, self._surface_normal(disp)[..., :2]], -1)
        target = inputs["color"][:, 0]
        lab = rgb2lab(target)
        gt_ab = lab[..., 1:]
        net_in = jnp.concatenate([disp, lab[..., 0:1]], axis=-1)
        mask = inputs.get("mask")
        if c.use_mask and mask is not None:
            m = mask[..., :1]
            if c.use_normal:
                m = jnp.broadcast_to(m, net_in.shape)
            pred = self.colorize_net(net_in * m, train=train)
            l = perceptional_loss(gt_ab, pred)
            l = jnp.sum(l * (1 - m[..., :1])) / jnp.sum(1 - m[..., :1])
        else:
            pred = self.colorize_net(net_in, train=train)
            l = perceptional_loss(gt_ab, pred).mean()
        return l * c.colorize_weight

    # ------------------------------------------------------------------ equivariant

    def _equivariant_outputs(self, inputs, outputs, train):
        """Warp the erase mask & all extractor stages into each source frame,
        decode res_imgs from the warped features
        (`mono_fm_joint_inpaint/net.py:636-688`)."""
        c = self.cfg
        mask = inputs["mask"]
        disp0 = outputs["disps"][0]
        res_imgs: Dict[int, List[jnp.ndarray]] = {}
        masks: Dict[int, List[jnp.ndarray]] = {}
        for i, f_i in enumerate(c.frame_ids[1:], start=1):
            T = self._frame_T(inputs, outputs, i, f_i)
            # mask warp keeps the reference's swapped (K, inv_K) order
            per_scale_masks = []
            for s in c.scales:
                disp = resize_bilinear(outputs["disps"][s], c.height, c.width)
                _, depth = disp_to_depth(disp, c.min_depth, c.max_depth)
                coords = warp_coords(depth, inputs["K"], inputs["inv_K"], T)
                per_scale_masks.append(self._grid_sample(mask, coords, method="nearest"))
            masks[i] = per_scale_masks

            src_feats = self.extractor(inputs["color"][:, i], train=train)
            warped_stages = []
            for src_f in src_feats:
                fh, fw = src_f.shape[1], src_f.shape[2]
                d = resize_bilinear(disp0, fh, fw)
                _, depth = disp_to_depth(d, c.min_depth, c.max_depth)
                sx = 1.0 / (c.width // fw)
                sy = 1.0 / (c.height // fh)
                Kf = scale_intrinsics(inputs["K"], sx, sy)
                coords = warp_coords(depth, invert_intrinsics(Kf), Kf, T)
                warped_stages.append(self._grid_sample(src_f, coords))
            res_imgs[i] = self.image_decoder(warped_stages)
        return {"res_imgs": res_imgs, "masks": masks}
