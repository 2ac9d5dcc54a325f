"""HRNet encoder + HR-Depth / DIFFNet decoder variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_models import base_cfg, make_inputs
from tripled_tpu.models.hrnet import HRNetFeatures
from tripled_tpu.models.hr_decoders import DIFFDepthDecoder, HRDepthDecoder
from tripled_tpu.models.registry import build_model

H, W = 96, 160


def test_hrnet_feature_shapes(rng_np):
    x = jnp.asarray(rng_np.rand(1, H, W, 3), jnp.float32)
    enc = HRNetFeatures(18)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    assert len(feats) == 5
    assert feats[0].shape == (1, H // 2, W // 2, 64)
    for i, (stride, ch) in enumerate([(4, 18), (8, 36), (16, 72), (32, 144)]):
        assert feats[i + 1].shape == (1, H // stride, W // stride, ch)


@pytest.mark.parametrize("decoder_cls", [HRDepthDecoder, DIFFDepthDecoder])
def test_hr_decoders_shapes(decoder_cls, rng_np):
    # resnet18-like pyramid
    chans = (64, 64, 128, 256, 512)
    feats = [
        jnp.asarray(rng_np.rand(1, H // s, W // s, c), jnp.float32)
        for s, c in zip((2, 4, 8, 16, 32), chans)
    ]
    dec = decoder_cls(chans)
    variables = dec.init(jax.random.PRNGKey(0), feats, train=False)
    disps = dec.apply(variables, feats, train=False)
    assert len(disps) == 4
    # HR decoders emit scale-0 at full input resolution (final 2× upsample
    # from the stride-2 grid), unlike the CRP decoder's half-res scale 0
    assert disps[0].shape == (1, H, W, 1)
    for d in disps:
        arr = np.asarray(d)
        assert (arr >= 0).all() and (arr <= 1).all()


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
