"""Coverage for config options not exercised by the main variant matrix:
pixel-shuffle decoder upsampling, pose-from-prediction (use_pfp), and the
disentangle skip attention types (ca/pa/asca/1x1)."""

import jax
import numpy as np
import pytest

from tests.test_models import base_cfg, make_inputs
from tripled_tpu.models.registry import build_model

RNGS = {
    "params": jax.random.PRNGKey(0),
    "dropout": jax.random.PRNGKey(1),
    "automask": jax.random.PRNGKey(2),
}


def _train_once(cfg, inputs):
    model = build_model(cfg)
    variables = model.init(RNGS, inputs, train=True)
    (outputs, loss_dict), _ = model.apply(
        variables, inputs, train=True,
        rngs={k: v for k, v in RNGS.items() if k != "params"},
        mutable=["batch_stats"],
    )
    for k, v in loss_dict.items():
        assert np.isfinite(np.asarray(v)), k
    return outputs, loss_dict


def test_depth_use_shuffle(rng_np):
    cfg = base_cfg("mono_baseline", depth_use_shuffle=True)
    inputs = make_inputs(rng_np)
    outputs, _ = _train_once(cfg, inputs)
    d0 = np.asarray(outputs["disps"][0])
    assert d0.shape[1:] == (48, 80, 1)
    assert (d0 >= 0).all() and (d0 <= 1).all()


def test_use_pfp_feeds_pose_from_reconstruction(rng_np):
    cfg = base_cfg(
        "mono_fm_joint_inpaint_disentangle",
        disentangle_layers=(False, False, False, False, True),
        auto_res_weight=5e-3,
        use_pfp=True,
    )
    inputs = make_inputs(rng_np, with_mask=True)
    outputs, loss_dict = _train_once(cfg, inputs)
    assert "auto_res" in outputs
    assert "auto_res_loss" in loss_dict


@pytest.mark.parametrize("skip_type", ["ca", "pa", "asca", "1x1"])
def test_depth_skip_types(skip_type, rng_np):
    cfg = base_cfg(
        "mono_fm_joint_inpaint_disentangle",
        disentangle_layers=(False, False, False, False, True),
        auto_res_weight=5e-3,
        depth_skip_type=skip_type,
        depth_disentangle_type="1x1" if skip_type == "1x1" else "use_half",
    )
    inputs = make_inputs(rng_np, with_mask=True)
    _train_once(cfg, inputs)


def test_color_skip_1x1(rng_np):
    cfg = base_cfg(
        "mono_fm_joint_inpaint_disentangle",
        disentangle_layers=(False, False, False, False, True),
        auto_res_weight=5e-3,
        color_skip_type="1x1",
        color_skip_layers=(False, True, False, True),
    )
    inputs = make_inputs(rng_np, with_mask=True)
    outputs, _ = _train_once(cfg, inputs)
    assert outputs["auto_res"][0].shape[-1] == 3
