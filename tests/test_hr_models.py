"""HRNet encoder + HR-Depth / DIFFNet decoder variants: shape smoke tests
plus numeric torch parity with imported weights (VERDICT r1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_models import base_cfg, make_inputs
from tripled_tpu.models.hrnet import HRNetFeatures
from tripled_tpu.models.hr_decoders import DIFFDepthDecoder, HRDepthDecoder
from tripled_tpu.models.registry import build_model
from tripled_tpu.utils.ref_loader import load_ref_module
from tripled_tpu.utils.torch_import import (
    import_diff_decoder_params,
    import_hr_depth_decoder_params,
    import_hrnet,
)

H, W = 96, 160


def _nested_shapes():
    """[stem, list18(4), list36(3), list72(2), f144] for hrnet18 at H, W."""
    return [
        (H // 2, W // 2, 64),
        [(H // 4, W // 4, 64), (H // 4, W // 4, 18), (H // 4, W // 4, 18),
         (H // 4, W // 4, 18)],
        [(H // 8, W // 8, 36)] * 3,
        [(H // 16, W // 16, 72)] * 2,
        (H // 32, W // 32, 144),
    ]


def _flatten(feats):
    out = []
    for f in feats:
        out.extend(f) if isinstance(f, list) else out.append(f)
    return out


def test_hrnet_feature_shapes(rng_np):
    x = jnp.asarray(rng_np.rand(1, H, W, 3), jnp.float32)
    enc = HRNetFeatures(18)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    want = _nested_shapes()
    assert len(feats) == 5
    for f, s in zip(_flatten(feats), _flatten(want)):
        assert f.shape == (1,) + s


def _rand_nested(rng_np, batch=1):
    def mk(s):
        return jnp.asarray(rng_np.rand(batch, *s), jnp.float32)

    return [
        mk(s) if not isinstance(s, list) else [mk(t) for t in s]
        for s in _nested_shapes()
    ]


def test_diff_decoder_shapes(rng_np):
    feats = _rand_nested(rng_np)
    dec = DIFFDepthDecoder((64, 18, 36, 72, 144))
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    disps = dec.apply(variables, feats, train=False)
    assert len(disps) == 4
    assert disps[0].shape == (1, H, W, 1)
    for d in disps:
        arr = np.asarray(d)
        assert (arr >= 0).all() and (arr <= 1).all()


def test_hr_decoder_shapes(rng_np):
    chans = (64, 64, 128, 256, 512)
    feats = [
        jnp.asarray(rng_np.rand(1, H // s, W // s, c), jnp.float32)
        for s, c in zip((2, 4, 8, 16, 32), chans)
    ]
    dec = HRDepthDecoder(chans)
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    disps = dec.apply(variables, feats, train=False)
    assert len(disps) == 4
    assert disps[0].shape == (1, H, W, 1)


def test_hr_depth_variant_trains(rng_np):
    cfg = base_cfg("mono_fm_joint", perception_weight=1e-3, use_hr_depth=True)
    model = build_model(cfg)
    inputs = make_inputs(rng_np)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "automask": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, inputs, train=True)
    (outputs, loss_dict), _ = model.apply(
        variables, inputs, train=True,
        rngs={k: v for k, v in rngs.items() if k != "params"},
        mutable=["batch_stats"],
    )
    for k, v in loss_dict.items():
        assert np.isfinite(np.asarray(v)), k


def test_diffnet_variant_eval(rng_np):
    cfg = base_cfg("mono_baseline", use_diffnet=True)
    model = build_model(cfg)
    inputs = make_inputs(rng_np)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, train=False)
    disps = model.apply(variables, inputs, train=False)
    assert disps[0].shape == (2, H, W, 1)


# --------------------------------------------------------------- torch parity

def _ref_hrnet18():
    enc_mod = load_ref_module("mono_fm_joint.diffnet_encoder")
    model = enc_mod.hrnet18(pretrained=False)
    model.eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
    return model


def test_hrnet_matches_reference(rng_np):
    """import_hrnet order-zip: our flax HRNet reproduces the reference torch
    HighResolutionNet (`diffnet_encoder.py:296-496`) feature-for-feature,
    including the nested DIFFNet output structure and the bilinear
    align_corners=True fuse path."""
    t_model = _ref_hrnet18()
    x = rng_np.rand(1, H, W, 3).astype(np.float32)

    enc = HRNetFeatures(18)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0)}, np.zeros_like(x), train=False
    )
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    p, s = import_hrnet(sd, variables["params"], variables["batch_stats"])
    ours = enc.apply(
        {"params": p, "batch_stats": s}, x, train=False
    )

    with torch.no_grad():
        ref = t_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    ours_flat = _flatten(ours)
    ref_flat = _flatten([r if isinstance(r, list) else r for r in ref])
    assert len(ours_flat) == len(ref_flat) == 11
    for i, (o, r) in enumerate(zip(ours_flat, ref_flat)):
        np.testing.assert_allclose(
            np.asarray(o), np.transpose(r.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=2e-3, err_msg=f"feature {i}",
        )


def test_diff_decoder_matches_reference(rng_np):
    dd = load_ref_module("mono_fm_joint.depth_decoder")
    t_dec = dd.DIFFDepthDecoder([64, 18, 36, 72, 144])
    t_dec.eval()
    g = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for prm in t_dec.parameters():
            prm.add_(torch.randn(prm.shape, generator=g) * 0.05)

    feats = _rand_nested(rng_np)
    dec = DIFFDepthDecoder((64, 18, 36, 72, 144))
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    sd = {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}
    params = import_diff_decoder_params(sd, variables["params"])
    got = dec.apply({"params": params}, feats, train=False)

    def to_t(f):
        return torch.from_numpy(np.transpose(np.asarray(f), (0, 3, 1, 2)))

    t_feats = [
        [to_t(t) for t in f] if isinstance(f, list) else to_t(f) for f in feats
    ]
    with torch.no_grad():
        ref = t_dec(t_feats)
    for s in range(4):
        r = np.transpose(ref[("disp", 0, s)].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(got[s]), r, rtol=1e-3, atol=1e-5,
            err_msg=f"diff disp scale {s}",
        )


def test_hr_depth_decoder_matches_reference(rng_np):
    dd = load_ref_module("mono_fm_joint.depth_decoder")
    t_dec = dd.HRDepthDecoder([64, 64, 128, 256, 512])
    t_dec.eval()
    g = torch.Generator().manual_seed(6)
    with torch.no_grad():
        for prm in t_dec.parameters():
            prm.add_(torch.randn(prm.shape, generator=g) * 0.05)

    chans = (64, 64, 128, 256, 512)
    feats = [
        rng_np.rand(1, H // s, W // s, c).astype(np.float32)
        for s, c in zip((2, 4, 8, 16, 32), chans)
    ]
    dec = HRDepthDecoder(chans)
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    sd = {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}
    params = import_hr_depth_decoder_params(sd, variables["params"])
    got = dec.apply({"params": params}, feats, train=False)

    with torch.no_grad():
        ref = t_dec([
            torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats
        ])
    for s in range(4):
        r = np.transpose(ref[("disp", 0, s)].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(got[s]), r, rtol=1e-3, atol=1e-4,
            err_msg=f"hr disp scale {s}",
        )
