"""PyTorch-checkpoint → flax parameter import.

The reference saves `{'state_dict': ...}` with submodule-name prefixes
(`DepthEncoder.*`, `PoseEncoder.*`, ... — SURVEY §5 checkpoint format). This
module converts those tensors into our flax trees so reference-trained
weights can be loaded for bit-parity validation and finetuning.

Both the reference's torchvision-style ResNet and our `ResNetFeatures`
create conv/bn layers in the same order (stem conv1/bn1, then per block
conv1,bn1,conv2,bn2[,conv3,bn3][,downsample conv,bn]), so an ordered zip of
the torch layer stream against the known flax module layout is a faithful
mapping.
"""

from __future__ import annotations

import copy
import re
from typing import Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def filter_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select keys under `prefix.` and strip it (insertion order preserved)."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def _torch_layers_in_order(sd: Dict[str, np.ndarray]):
    """Group a (prefix-filtered, insertion-ordered) torch state_dict into an
    ordered stream of ('conv', entry) / ('bn', entry) / ('linear', entry)."""
    grouped: Dict[str, dict] = {}
    order: List[str] = []
    for k in sd:
        base, leaf = k.rsplit(".", 1)
        if base not in grouped:
            order.append(base)
            grouped[base] = {}
        grouped[base][leaf] = sd[k]
    layers = []
    for base in order:
        e = grouped[base]
        if "running_mean" in e:
            layers.append(("bn", e))
        elif "weight" in e and e["weight"].ndim == 4:
            layers.append(("conv", e))
        elif "weight" in e and e["weight"].ndim == 2:
            layers.append(("linear", e))
    return layers


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _natkey(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _resnet_flax_slots(params: dict, stats: dict):
    """Conv/BN slot paths of a `ResNetFeatures` tree in creation order:
    stem (top-level Conv_0/BatchNorm_0), then BasicBlock_i / Bottleneck_i
    ascending, each with its Conv_j/BatchNorm_j ascending."""
    conv_paths, bn_paths = [], []

    def block_names(tree):
        names = [
            k for k in tree
            if k.startswith("BasicBlock_") or k.startswith("Bottleneck_")
        ]
        return sorted(names, key=_natkey)

    conv_paths.append(("Conv_0", "kernel"))
    bn_paths.append(("BatchNorm_0",))
    for blk in block_names(params):
        sub = params[blk]
        n_convs = len([k for k in sub if k.startswith("Conv_")])
        for j in range(n_convs):
            conv_paths.append((blk, f"Conv_{j}", "kernel"))
            bn_paths.append((blk, f"BatchNorm_{j}"))
    return conv_paths, bn_paths


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    expected = np.asarray(node[path[-1]]).shape
    if tuple(value.shape) != tuple(expected):
        raise ValueError(f"shape mismatch at {path}: {value.shape} vs {expected}")
    node[path[-1]] = value.astype(np.asarray(node[path[-1]]).dtype)


def import_resnet(
    torch_sd: Dict[str, np.ndarray],
    flax_params: dict,
    flax_batch_stats: dict,
) -> Tuple[dict, dict]:
    """Fill a `ResNetFeatures` (params, batch_stats) pair from a torch resnet
    state_dict (prefix-stripped, e.g. `filter_prefix(sd, 'DepthEncoder.encoder')`).
    The torch `fc` head, absent from our feature extractor, is ignored."""
    import jax

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))

    layers = _torch_layers_in_order(torch_sd)
    convs = [e for t, e in layers if t == "conv"]
    bns = [e for t, e in layers if t == "bn"]

    conv_paths, bn_paths = _resnet_flax_slots(params, stats)
    if len(convs) != len(conv_paths) or len(bns) != len(bn_paths):
        raise ValueError(
            f"layer-count mismatch: torch {len(convs)} convs / {len(bns)} bns "
            f"vs flax {len(conv_paths)} / {len(bn_paths)}"
        )

    for path, e in zip(conv_paths, convs):
        _set(params, path, _conv_to_hwio(e["weight"]))
    for path, e in zip(bn_paths, bns):
        _set(params, path + ("scale",), e["weight"])
        _set(params, path + ("bias",), e["bias"])
        _set(stats, path + ("mean",), e["running_mean"])
        _set(stats, path + ("var",), e["running_var"])
    return params, stats


def import_depth_encoder(ckpt_path_or_sd, encoder_variables, prefix="DepthEncoder"):
    """Import a reference `DepthEncoder.encoder.*` into our DepthEncoder
    variables ({'params': {'ResNetFeatures_0': ...}, 'batch_stats': ...})."""
    sd = (
        load_torch_state_dict(ckpt_path_or_sd)
        if isinstance(ckpt_path_or_sd, str)
        else ckpt_path_or_sd
    )
    sub = filter_prefix(sd, f"{prefix}.encoder") or filter_prefix(sd, "encoder") or sd
    params = copy.deepcopy(
        {k: v for k, v in encoder_variables["params"].items()}
    )
    stats = copy.deepcopy(
        {k: v for k, v in encoder_variables["batch_stats"].items()}
    )
    key = next(iter(params))  # 'ResNetFeatures_0'
    p, s = import_resnet(sub, params[key], stats[key])
    params[key] = p
    stats[key] = s
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------- decoders

# torch key prefix → our flax DepthDecoder module name, per level. The flax
# decoder creates modules per level in call order: Conv1x1 (reduce), Conv3x3
# (iconv), CRPBlock (4 pointwise Conv1x1), Conv3x3 (merge), Conv3x3 (disp) —
# levels run 4,3,2,1 so indices increment by level.
def _hrnet_flax_slots(params: dict):
    """Conv/BN slot paths of a `HRNetFeatures` tree in creation order, which
    mirrors the torch HRNet registration order (`diffnet_encoder.py:296-355`):
    stem ×2, layer1 Bottlenecks, then per stage: transition convs,
    _HRModule (branch BasicBlocks then fuse convs)."""
    conv_paths, bn_paths = [], []

    def add(prefix, idx):
        conv_paths.append(prefix + (f"Conv_{idx}", "kernel"))
        bn_paths.append(prefix + (f"BatchNorm_{idx}",))

    def add_blocks(prefix, tree, kind):
        for blk in sorted(
            [k for k in tree if k.startswith(kind)], key=_natkey
        ):
            n = len([k for k in tree[blk] if k.startswith("Conv_")])
            for j in range(n):
                add(prefix + (blk,), j)

    add((), 0)
    add((), 1)
    add_blocks((), params, "Bottleneck_")

    tconv = 2
    hrm = 0
    stage_modules = {2: 1, 3: 4, 4: 3}
    for stage in (2, 3, 4):
        # stage2 transition: branch0 reshape conv + new-branch conv;
        # stages 3/4: only the new-branch conv (channels already match)
        for _ in range(2 if stage == 2 else 1):
            add((), tconv)
            tconv += 1
        for _ in range(stage_modules[stage]):
            mod = f"_HRModule_{hrm}"
            hrm += 1
            mp = params[mod]
            add_blocks((mod,), mp, "BasicBlock_")
            if "_FuseLayer_0" in mp:
                n = len([k for k in mp["_FuseLayer_0"] if k.startswith("Conv_")])
                for j in range(n):
                    add((mod, "_FuseLayer_0"), j)
    return conv_paths, bn_paths


def import_hrnet(
    torch_sd: Dict[str, np.ndarray],
    flax_params: dict,
    flax_batch_stats: dict,
) -> Tuple[dict, dict]:
    """Fill a `HRNetFeatures` (params, batch_stats) pair from a torch
    `HighResolutionNet` state_dict (ordered zip, like `import_resnet`).
    Supports pretrained HRNet-W18/32/48/64 checkpoints; classifier heads
    (incre/downsamp/final/fc), absent from the backbone, are ignored."""
    import jax

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_params))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, flax_batch_stats))

    backbone = {
        k: v
        for k, v in torch_sd.items()
        if not k.startswith(
            ("incre_modules", "downsamp_modules", "final_layer", "classifier", "fc")
        )
    }
    layers = _torch_layers_in_order(backbone)
    convs = [e for t, e in layers if t == "conv"]
    bns = [e for t, e in layers if t == "bn"]

    conv_paths, bn_paths = _hrnet_flax_slots(params)
    if len(convs) != len(conv_paths) or len(bns) != len(bn_paths):
        raise ValueError(
            f"layer-count mismatch: torch {len(convs)} convs / {len(bns)} bns "
            f"vs flax {len(conv_paths)} / {len(bn_paths)}"
        )
    for path, e in zip(conv_paths, convs):
        _set(params, path, _conv_to_hwio(e["weight"]))
    for path, e in zip(bn_paths, bns):
        _set(params, path + ("scale",), e["weight"])
        _set(params, path + ("bias",), e["bias"])
        _set(stats, path + ("mean",), e["running_mean"])
        _set(stats, path + ("var",), e["running_var"])
    return params, stats


def _depth_decoder_key_map():
    mapping = {}
    for li, level in enumerate((4, 3, 2, 1)):
        mapping[f"reduce{level}"] = (f"Conv1x1_{li}", "Conv_0")
        mapping[f"iconv{level}"] = (f"Conv3x3_{3 * li}", "Conv_0")
        for t in range(4):
            mapping[f"crp{level}.0.{t + 1}_pointwise"] = (
                f"CRPBlock_{li}", f"Conv1x1_{t}", "Conv_0",
            )
        mapping[f"merge{level}"] = (f"Conv3x3_{3 * li + 1}", "Conv_0")
        mapping[f"disp{level}.0"] = (f"Conv3x3_{3 * li + 2}", "Conv_0")
    return mapping


def _shuffle_decoder_key_map():
    """use_shuffle=True decoders add up4..up1 (Sequential: ReflectionPad,
    Conv2d, PixelShuffle, ELU — `layers.py:124-134`); the conv is index 1.
    `up1` is dead weight — the reference forward reuses up2 for level 1
    (`depth_decoder.py:104-107`), mirrored by our shared module."""
    return {
        f"up{level}.1": (f"UpShuffle_{li}", "Conv_0")
        for li, level in enumerate((4, 3, 2))
    }


def import_depth_decoder_params(torch_sd, flax_params: dict) -> dict:
    """Fill our flax `DepthDecoder` params from the reference torch
    `DepthDecoder` state_dict (`mono/model/mono_fm_joint/depth_decoder.py:8-115`).
    """
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    for tname, fpath in _depth_decoder_key_map().items():
        w = torch_sd[f"{tname}.conv.weight"]
        _set(params, fpath + ("kernel",), _conv_to_hwio(w))
        b = torch_sd.get(f"{tname}.conv.bias")
        if b is not None:
            _set(params, fpath + ("bias",), b)
    for tname, fpath in _shuffle_decoder_key_map().items():
        w = torch_sd.get(f"{tname}.weight")
        if w is None:  # nearest-upsample decoder: no shuffle convs
            continue
        _set(params, fpath + ("kernel",), _conv_to_hwio(w))
        _set(params, fpath + ("bias",), torch_sd[f"{tname}.bias"])
    return params


def _set_conv(params, path, torch_sd, tname):
    _set(params, path + ("kernel",), _conv_to_hwio(torch_sd[f"{tname}.weight"]))
    b = torch_sd.get(f"{tname}.bias")
    if b is not None:
        _set(params, path + ("bias",), b)


def import_hr_depth_decoder_params(torch_sd, flax_params: dict) -> dict:
    """Reference HRDepthDecoder (`depth_decoder.py:118-240`) → our
    `HRDepthDecoder`. Torch names its convs via a ModuleDict
    (X_ij_Conv_0/1, X_ij_attention fSE, X_ij_downsample); our flax names
    follow call order over the same position list, enumerated here. The
    reference's never-used convs (X_0j_Conv_0 for j<4) are skipped."""
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    positions = ("01", "11", "21", "31", "02", "12", "22", "03", "13", "04")
    attention = {"31", "22", "13", "04"}
    cb = 0   # ConvBlock counter
    fse = 0  # FSEModule counter
    ds = 0   # Conv1x1 downsample counter
    for index in positions:
        row, col = int(index[0]), int(index[1])
        src = f"X_{row + 1}{col - 1}_Conv_0"
        _set_conv(params, (f"ConvBlock_{cb}", "Conv3x3_0", "Conv_0"),
                  torch_sd, f"convs.{src}.conv.conv")
        cb += 1
        if index in attention:
            t = f"convs.X_{index}_attention"
            p = (f"FSEModule_{fse}",)
            _set(params, p + ("Dense_0", "kernel"), torch_sd[f"{t}.fc.0.weight"].T)
            _set(params, p + ("Dense_1", "kernel"), torch_sd[f"{t}.fc.2.weight"].T)
            _set_conv(params, p + ("Conv_0",), torch_sd, f"{t}.conv_se")
            fse += 1
        else:
            if col != 1:
                _set_conv(params, (f"Conv1x1_{ds}", "Conv_0"), torch_sd,
                          f"convs.X_{index}_downsample.conv")
                ds += 1
            _set_conv(params, (f"ConvBlock_{cb}", "Conv3x3_0", "Conv_0"),
                      torch_sd, f"convs.X_{row + 1}{col - 1}_Conv_1.conv.conv")
            cb += 1
    _set_conv(params, (f"ConvBlock_{cb}", "Conv3x3_0", "Conv_0"),
              torch_sd, "convs.X_04_Conv_0.conv.conv")
    _set_conv(params, (f"ConvBlock_{cb + 1}", "Conv3x3_0", "Conv_0"),
              torch_sd, "convs.X_04_Conv_1.conv.conv")
    for i in range(4):
        _set_conv(params, (f"Conv3x3_{i}", "Conv_0"), torch_sd,
                  f"convs.dispConvScale{i}.conv")
    return params


def import_diff_decoder_params(torch_sd, flax_params: dict) -> dict:
    """Reference DIFFDepthDecoder (`depth_decoder.py:243-296`) → our
    `DIFFDepthDecoder`: Attention_Modules 72/36/18/9 → AttentionModule_0..3,
    up_x9_0/1 → ConvBlock_0/1, dispConvScale0..3 → Conv3x3_0..3."""
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    for i, name in enumerate(("72", "36", "18", "9")):
        t = f"convs.{name}"
        p = (f"AttentionModule_{i}",)
        _set(params, p + ("ChannelAttention_0", "Dense_0", "kernel"),
             torch_sd[f"{t}.ca.fc.0.weight"].T)
        _set(params, p + ("ChannelAttention_0", "Dense_1", "kernel"),
             torch_sd[f"{t}.ca.fc.2.weight"].T)
        _set_conv(params, p + ("Conv_0",), torch_sd, f"{t}.conv_se")
    for i, name in enumerate(("up_x9_0", "up_x9_1")):
        _set_conv(params, (f"ConvBlock_{i}", "Conv3x3_0", "Conv_0"),
                  torch_sd, f"convs.{name}.conv.conv")
    for i in range(4):
        _set_conv(params, (f"Conv3x3_{i}", "Conv_0"), torch_sd,
                  f"convs.dispConvScale{i}.conv")
    return params


def import_image_decoder_params(torch_sd, flax_params: dict) -> dict:
    """Reference autoencoder `Decoder` (`mono_fm_joint/decoder.py:7-57`) →
    our `ImageDecoder`: upconv/iconv ConvBlocks interleave in flax call
    order; the 4 sigmoid heads run deepest-first (disp4..disp1)."""
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    blocks = ["upconv5", "iconv5", "upconv4", "iconv4", "upconv3", "iconv3",
              "upconv2", "iconv2", "upconv1", "iconv1"]
    for i, tname in enumerate(blocks):
        _set_conv(params, (f"ConvBlock_{i}", "Conv3x3_0", "Conv_0"),
                  torch_sd, f"{tname}.conv.conv")
    for i, tname in enumerate(("disp4", "disp3", "disp2", "disp1")):
        _set_conv(params, (f"Conv3x3_{i}", "Conv_0"), torch_sd, f"{tname}.conv")
    return params


def import_color_decoder_params(
    torch_sd, flax_params: dict, skip_layers=(False, False, False, False)
) -> dict:
    """Reference `ColorDecoder` (`mono_fm_joint/decoder.py:60-113`) → our
    `ColorDecoder`. Skip ConvBlocks only exist in flax when the matching
    `skip_layers` flag is on (torch always creates them; unused ones are
    dropped). Heads run shallow-first (disp1..disp4) per our call order."""
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    blocks = ["upconv5", "iconv5", "upconv4"]
    if skip_layers[0]:
        blocks.append("upconv5_skip")
    blocks += ["iconv4", "upconv3"]
    if skip_layers[1]:
        blocks.append("upconv4_skip")
    blocks += ["iconv3", "upconv2"]
    if skip_layers[2]:
        blocks.append("upconv3_skip")
    blocks += ["iconv2", "upconv1"]
    if skip_layers[3]:
        blocks.append("upconv2_skip")
    blocks.append("iconv1")
    for i, tname in enumerate(blocks):
        _set_conv(params, (f"ConvBlock_{i}", "Conv3x3_0", "Conv_0"),
                  torch_sd, f"{tname}.conv.conv")
    for i, tname in enumerate(("disp1", "disp2", "disp3", "disp4")):
        _set_conv(params, (f"Conv3x3_{i}", "Conv_0"), torch_sd, f"{tname}.conv")
    return params


def import_pose_decoder_params(torch_sd, flax_params: dict) -> dict:
    """Reference PoseDecoder (`mono/model/mono_fm/pose_decoder.py:5-26`):
    reduce → conv1 → conv2 → conv3 map onto our Conv_0..Conv_3."""
    params = copy.deepcopy(
        __import__("jax").tree_util.tree_map(np.asarray, flax_params)
    )
    for i, tname in enumerate(("reduce", "conv1", "conv2", "conv3")):
        _set(params, (f"Conv_{i}", "kernel"), _conv_to_hwio(torch_sd[f"{tname}.weight"]))
        _set(params, (f"Conv_{i}", "bias"), torch_sd[f"{tname}.bias"])
    return params


def import_reference_checkpoint(
    ckpt_path_or_sd, variables: dict, color_skip_layers=None
) -> dict:
    """Import a full reference training checkpoint (`{'state_dict': ...}`
    with `DepthEncoder.* / DepthDecoder.* / PoseEncoder.* / PoseDecoder.*`
    prefixes) into a TripleDNet variables tree, covering the submodules the
    depth/pose evaluation paths need. Missing prefixes are skipped."""
    sd = (
        load_torch_state_dict(ckpt_path_or_sd)
        if isinstance(ckpt_path_or_sd, str)
        else ckpt_path_or_sd
    )
    import jax

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, variables["params"]))
    stats = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    )

    def enc_key(tree):
        # remat models wrap the encoder as CheckpointResNetFeatures_*
        return next(k for k in tree if "ResNetFeatures" in k)

    de = filter_prefix(sd, "DepthEncoder.encoder")
    if de and "depth_encoder" in params:
        k = enc_key(params["depth_encoder"])
        p, s = import_resnet(de, params["depth_encoder"][k],
                             stats["depth_encoder"][k])
        params["depth_encoder"][k] = p
        stats["depth_encoder"][k] = s

    dd = filter_prefix(sd, "DepthDecoder")
    if dd and "depth_decoder" in params:
        params["depth_decoder"] = import_depth_decoder_params(
            dd, params["depth_decoder"]
        )

    pe = filter_prefix(sd, "PoseEncoder.encoder")
    if pe and "pose_encoder" in params:
        k = enc_key(params["pose_encoder"])
        p, s = import_resnet(pe, params["pose_encoder"][k],
                             stats["pose_encoder"][k])
        params["pose_encoder"][k] = p
        stats["pose_encoder"][k] = s

    pd = filter_prefix(sd, "PoseDecoder")
    if pd and "pose_decoder" in params:
        params["pose_decoder"] = import_pose_decoder_params(
            pd, params["pose_decoder"]
        )

    ex = filter_prefix(sd, "Encoder.encoder")
    if ex and "extractor" in params:
        k = enc_key(params["extractor"])
        p, s = import_resnet(ex, params["extractor"][k], stats["extractor"][k])
        params["extractor"][k] = p
        stats["extractor"][k] = s

    idec = filter_prefix(sd, "Decoder")
    if idec and "image_decoder" in params:
        params["image_decoder"] = import_image_decoder_params(
            idec, params["image_decoder"]
        )

    cdec = filter_prefix(sd, "ColorDecoder")
    if cdec and "color_decoder" in params:
        if color_skip_layers is None:
            # call-order naming: 10 trunk ConvBlocks + one per active skip.
            # The count disambiguates only the no-skip case; callers with
            # active skips must pass `color_skip_layers` explicitly.
            n_blocks = sum(
                1 for k in params["color_decoder"]
                if k.startswith("ConvBlock_")
            )
            if n_blocks != 10:
                raise ValueError(
                    "ColorDecoder has active skip connections; pass "
                    "color_skip_layers to import_reference_checkpoint"
                )
            color_skip_layers = (False, False, False, False)
        params["color_decoder"] = import_color_decoder_params(
            cdec, params["color_decoder"], color_skip_layers
        )

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
