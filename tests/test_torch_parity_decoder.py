"""Full depth-net numeric parity: reference torch encoder+decoder vs ours
with imported weights (eval mode). This is the bit-compatibility evidence for
the Eigen evaluation path."""

import importlib.util
import sys
import types

import jax
import numpy as np
import pytest
import torch

from tripled_tpu.models.depth_decoder import DepthDecoder
from tripled_tpu.models.encoders import DepthEncoder
from tripled_tpu.models.pose_decoder import PoseDecoder
from tripled_tpu.utils.torch_import import (
    import_depth_decoder_params,
    import_pose_decoder_params,
    import_resnet,
)

BASE = "/root/reference/mono/model/mono_fm_joint/"


def _load_ref_pkg():
    if "refpkg" in sys.modules:
        return sys.modules["refpkg"]
    pkg = types.ModuleType("refpkg")
    pkg.__path__ = []
    sys.modules["refpkg"] = pkg
    for name in ("resnet", "layers", "depth_decoder"):
        spec = importlib.util.spec_from_file_location(
            f"refpkg.{name}", BASE + f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpkg.{name}"] = mod
        spec.loader.exec_module(mod)
    return pkg


def test_depth_decoder_matches_reference(rng_np):
    pkg = _load_ref_pkg()
    dd = sys.modules["refpkg.depth_decoder"]
    chans = [64, 64, 128, 256, 512]
    t_dec = dd.DepthDecoder(chans)
    t_dec.eval()

    H, W = 64, 96
    feats_np = [
        rng_np.randn(1, c, H // s, W // s).astype(np.float32) * 0.5
        for c, s in zip(chans, (2, 4, 8, 16, 32))
    ]

    ours = DepthDecoder(tuple(chans))
    flax_feats = [np.transpose(f, (0, 2, 3, 1)) for f in feats_np]
    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, flax_feats, train=False
    )
    sd = {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}
    params = import_depth_decoder_params(sd, variables["params"])
    got = ours.apply({"params": params}, flax_feats, train=False)

    with torch.no_grad():
        ref = t_dec([torch.from_numpy(f) for f in feats_np])
    for s in range(4):
        r = np.transpose(ref[("disp", 0, s)].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(got[s]), r, rtol=1e-3, atol=1e-5,
            err_msg=f"disp scale {s}",
        )


def test_full_depth_net_matches_reference(rng_np):
    """encoder (imported resnet18) + CRP decoder end-to-end vs torch."""
    pkg = _load_ref_pkg()
    ref_resnet = sys.modules["refpkg.resnet"]
    dd = sys.modules["refpkg.depth_decoder"]

    t_enc = ref_resnet.resnet18()
    t_enc.eval()
    with torch.no_grad():
        for m in t_enc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    t_dec = dd.DepthDecoder([64, 64, 128, 256, 512])
    t_dec.eval()

    x = rng_np.rand(1, 64, 96, 3).astype(np.float32)

    enc = DepthEncoder(18)
    ev = enc.init({"params": jax.random.PRNGKey(0)},
                  np.zeros_like(x), train=False)
    esd = {k: v.detach().numpy() for k, v in t_enc.state_dict().items()}
    p, s = import_resnet(esd, ev["params"]["ResNetFeatures_0"],
                         ev["batch_stats"]["ResNetFeatures_0"])
    ev = {"params": {"ResNetFeatures_0": p},
          "batch_stats": {"ResNetFeatures_0": s}}

    dec = DepthDecoder((64, 64, 128, 256, 512))
    feats = enc.apply(ev, x, train=False)
    dv = dec.init({"params": jax.random.PRNGKey(1)}, feats, train=False)
    dsd = {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}
    dp = import_depth_decoder_params(dsd, dv["params"])
    disp0 = np.asarray(dec.apply({"params": dp}, feats, train=False)[0])

    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        t = (t - 0.45) / 0.225
        f = []
        t = t_enc.relu(t_enc.bn1(t_enc.conv1(t)))
        f.append(t)
        f.append(t_enc.layer1(t_enc.maxpool(f[-1])))
        for layer in (t_enc.layer2, t_enc.layer3, t_enc.layer4):
            f.append(layer(f[-1]))
        ref_disp0 = t_dec(f)[("disp", 0, 0)].numpy()

    np.testing.assert_allclose(
        disp0, np.transpose(ref_disp0, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_pose_decoder_matches_reference(rng_np):
    spec = importlib.util.spec_from_file_location(
        "ref_pose_decoder", "/root/reference/mono/model/mono_fm/pose_decoder.py"
    )
    pd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pd)

    t_pose = pd.PoseDecoder([64, 64, 128, 256, 512])
    t_pose.eval()
    f = rng_np.randn(2, 512, 6, 20).astype(np.float32)

    ours = PoseDecoder()
    flax_f = np.transpose(f, (0, 2, 3, 1))
    variables = ours.init({"params": jax.random.PRNGKey(0)}, flax_f)
    sd = {k: v.detach().numpy() for k, v in t_pose.state_dict().items()}
    params = import_pose_decoder_params(sd, variables["params"])
    aa, t = ours.apply({"params": params}, flax_f)

    with torch.no_grad():
        raa, rt = t_pose([torch.from_numpy(f)])
    np.testing.assert_allclose(np.asarray(aa), raa.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), rt.numpy(), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_import_reference_checkpoint_full_model(rng_np, tmp_path, remat):
    """A synthetic reference-format .pth (DepthEncoder/DepthDecoder/
    PoseEncoder/PoseDecoder prefixes) loads into TripleDNet and reproduces
    the torch depth forward — including into remat configs, whose encoder
    scope is renamed CheckpointResNetFeatures_* by nn.remat."""
    from tripled_tpu.config import ModelConfig
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.utils.inputs import dummy_train_inputs
    from tripled_tpu.utils.torch_import import import_reference_checkpoint

    pkg = _load_ref_pkg()
    ref_resnet = sys.modules["refpkg.resnet"]
    dd = sys.modules["refpkg.depth_decoder"]

    t_enc = ref_resnet.resnet18()
    t_dec = dd.DepthDecoder([64, 64, 128, 256, 512])
    t_enc.eval(); t_dec.eval()
    with torch.no_grad():
        for m in t_enc.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    sd = {}
    for k, v in t_enc.state_dict().items():
        sd[f"DepthEncoder.encoder.{k}"] = v
    for k, v in t_dec.state_dict().items():
        sd[f"DepthDecoder.{k}"] = v
    pth = tmp_path / "ref.pth"
    torch.save({"state_dict": sd}, pth)

    cfg = ModelConfig(name="mono_baseline", depth_num_layers=18,
                      height=64, width=96, pose_height=64, pose_width=96,
                      remat=remat)
    model = build_model(cfg)
    inputs = dummy_train_inputs(cfg, 1)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "automask": jax.random.PRNGKey(2)}
    variables = model.init(rngs, jax.device_put(inputs), train=True)
    variables = import_reference_checkpoint(str(pth), variables)

    x = rng_np.rand(1, 64, 96, 3).astype(np.float32)
    disp0 = np.asarray(
        model.apply(variables, {"color_aug": x[:, None], "color": x[:, None]},
                    train=False)[0]
    )

    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        t = (t - 0.45) / 0.225
        f = [t_enc.relu(t_enc.bn1(t_enc.conv1(t)))]
        f.append(t_enc.layer1(t_enc.maxpool(f[-1])))
        for layer in (t_enc.layer2, t_enc.layer3, t_enc.layer4):
            f.append(layer(f[-1]))
        ref_disp0 = t_dec(f)[("disp", 0, 0)].numpy()

    np.testing.assert_allclose(
        disp0, np.transpose(ref_disp0, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_shuffle_decoder_matches_reference(rng_np):
    """use_shuffle=True path: reflection-pad conv + PixelShuffle + ELU
    (layers.py:110-135). Torch reads the shuffle channel axis as (C, r, r);
    weights are randomized post-init so the channel-order permutation is
    actually exercised (the repeated subpixel init masks it)."""
    pkg = _load_ref_pkg()
    dd = sys.modules["refpkg.depth_decoder"]
    chans = [64, 64, 128, 256, 512]
    t_dec = dd.DepthDecoder(chans, use_shuffle=True)
    t_dec.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in t_dec.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.05)

    H, W = 64, 96
    feats_np = [
        rng_np.randn(1, c, H // s, W // s).astype(np.float32) * 0.5
        for c, s in zip(chans, (2, 4, 8, 16, 32))
    ]

    ours = DepthDecoder(tuple(chans), use_shuffle=True)
    flax_feats = [np.transpose(f, (0, 2, 3, 1)) for f in feats_np]
    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, flax_feats, train=False
    )
    sd = {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}
    params = import_depth_decoder_params(sd, variables["params"])
    got = ours.apply({"params": params}, flax_feats, train=False)

    with torch.no_grad():
        ref = t_dec([torch.from_numpy(f) for f in feats_np])
    for s in range(4):
        r = np.transpose(ref[("disp", 0, s)].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(got[s]), r, rtol=1e-3, atol=1e-5,
            err_msg=f"shuffle disp scale {s}",
        )
