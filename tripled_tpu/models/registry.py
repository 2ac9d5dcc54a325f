"""Model registry: reference MONO-registry names → config presets + modules.

The reference registers 13+ `nn.Module` classes in a registry keyed by class
name (`mono/model/registry.py:8-42`). Here each name is a *preset*: a
transformation of `ModelConfig` that switches on the right submodules/loss
terms of the single unified `TripleDNet` (or one of the small standalone
pretext models). `build_model(cfg)` returns the flax module.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from flax import linen as nn

from tripled_tpu.config import ModelConfig
from tripled_tpu.models.aux_nets import Autoencoder, RotNet
from tripled_tpu.models.net import TripleDNet

_PRESETS: Dict[str, Callable[[ModelConfig], ModelConfig]] = {}


def _preset(name):
    def deco(fn):
        _PRESETS[name] = fn
        return fn

    return deco


def _r(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


@_preset("mono_baseline")
def _baseline(c):
    return _r(c, use_extractor=False, use_image_decoder=False, perception_weight=0.0)


# the reference registers the monodepth2-style baseline under its class name
# `Baseline` (mono/model/mono_baseline/net.py:14-15)
_PRESETS["Baseline"] = lambda c: _baseline(c)


@_preset("mono_fm")
def _fm(c):
    # FeatDepth: frozen pretrained extractor, perceptual loss only
    # (`mono/model/mono_fm/net.py:29-141`)
    return _r(c, use_extractor=True, freeze_extractor=True, joint_extractor=False,
              use_image_decoder=False)


@_preset("mono_fm_joint")
def _fm_joint(c):
    return _r(c, use_extractor=True, joint_extractor=True, use_image_decoder=True)


@_preset("mono_fm_joint_inpaint")
def _fm_joint_inpaint(c):
    c = _fm_joint(c)
    use_ext = c.perception_weight != 0.0
    return _r(c, inpaint=True, use_extractor=use_ext,
              use_image_decoder=use_ext and c.img_reconstruct_weight != 0)


@_preset("mono_fm_joint_inpaint_disentangle")
def _disentangle(c):
    return _fm_joint_inpaint(c)


@_preset("mono_fm_joint_inpaint_distill_gs")
def _distill_gs(c):
    return _fm_joint_inpaint(c)


@_preset("mono_fm_joint_inpaint_distill_colorize")
def _distill_colorize(c):
    return _fm_joint_inpaint(c)


@_preset("mono_fm_joint_inpaint_disentangle_distill_colorize")
def _disentangle_distill_colorize(c):
    return _fm_joint_inpaint(c)


@_preset("mono_fm_joint_inpaint_disentangle_distill_sep_colorize")
def _sep_colorize(c):
    # the sep variants replace the disentangle ColorDecoder branch with their
    # own encoder/decoder pair; no auto_res term exists in the reference's
    # loss chain (`mono_fm_joint_inpaint/net.py:261-329`)
    return _r(_fm_joint_inpaint(c), sep_colorize=True, auto_res_weight=0.0,
              use_pfp=False)


@_preset("mono_fm_joint_inpaint_disentangle_distill_sep_inpaint")
def _sep_inpaint(c):
    return _r(_fm_joint_inpaint(c), sep_inpaint=True, auto_res_weight=0.0,
              use_pfp=False)


@_preset("mono_fm_joint_inpaint_map_pose")
def _map_pose(c):
    return _r(_fm_joint_inpaint(c), map_pose=True)


@_preset("mono_fm_joint_equivariant_inpaint")
def _equivariant(c):
    return _r(_fm_joint_inpaint(c), equivariant=True,
              use_extractor=True, use_image_decoder=True)


@_preset("mono_fm_joint_im_rot")
def _im_rot(c):
    return _r(_fm_joint(c), im_rot=True, use_image_decoder=False)


@_preset("autoencoder")
def _autoencoder(c):
    return c


@_preset("inpainter")
def _inpainter(c):
    return c


@_preset("rotnet")
def _rotnet(c):
    return c


def available_models():
    return sorted(_PRESETS)


def canonicalize(cfg: ModelConfig) -> ModelConfig:
    if cfg.name not in _PRESETS:
        raise KeyError(
            f"unknown model '{cfg.name}'; available: {available_models()}"
        )
    return _PRESETS[cfg.name](cfg)


def build_model(cfg: ModelConfig) -> nn.Module:
    cfg = canonicalize(cfg)
    if cfg.name == "autoencoder":
        return Autoencoder(cfg)
    if cfg.name == "inpainter":
        return Autoencoder(cfg, masked=True)
    if cfg.name == "rotnet":
        return RotNet(
            cfg,
            pretext_resize=cfg.pretext_resize,
            pretext_label_size=cfg.pretext_label_size,
            pretext_weight=cfg.pretext_weight,
        )
    return TripleDNet(cfg)
