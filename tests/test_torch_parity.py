"""Numeric parity: our flax ResNet encoder vs the reference torch encoder
with imported weights (eval mode, running BN stats)."""

import importlib.util

import jax
import numpy as np
import pytest
import torch

from tripled_tpu.models.encoders import DepthEncoder


def _load_ref_resnet():
    spec = importlib.util.spec_from_file_location(
        "ref_resnet", "/root/reference/mono/model/mono_fm_joint/resnet.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("num_layers", [18, 50])
def test_depth_encoder_matches_reference(num_layers, rng_np):
    ref = _load_ref_resnet()
    t_model = ref.resnet18() if num_layers == 18 else ref.resnet50()
    t_model.eval()
    # randomize BN stats so the test is not trivially identity
    with torch.no_grad():
        for m in t_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    x = rng_np.rand(1, 64, 96, 3).astype(np.float32)

    enc = DepthEncoder(num_layers)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0)}, np.zeros((1, 64, 96, 3), np.float32),
        train=False,
    )
    from tripled_tpu.utils.torch_import import import_resnet

    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    p, s = import_resnet(
        sd,
        variables["params"]["ResNetFeatures_0"],
        variables["batch_stats"]["ResNetFeatures_0"],
    )
    variables = {
        "params": {"ResNetFeatures_0": p},
        "batch_stats": {"ResNetFeatures_0": s},
    }
    ours = enc.apply(variables, x, train=False)

    # reference DepthEncoder.forward (depth_encoder.py:34-43)
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        t = (t - 0.45) / 0.225
        feats = []
        t = t_model.relu(t_model.bn1(t_model.conv1(t)))
        feats.append(t)
        t = t_model.layer1(t_model.maxpool(t))
        feats.append(t)
        for layer in (t_model.layer2, t_model.layer3, t_model.layer4):
            t = layer(t)
            feats.append(t)

    for i, (a, b) in enumerate(zip(ours, feats)):
        ref_np = np.transpose(b.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(a), ref_np, rtol=2e-3, atol=2e-4,
            err_msg=f"stage {i} mismatch (resnet{num_layers})",
        )
