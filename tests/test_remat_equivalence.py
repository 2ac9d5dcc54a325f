"""remat must be a pure memory/flops trade: losses and gradients identical.

Covers the r2 decoder-remat change (net.py: nn.remat on Depth/Color/Image
decoders when cfg.remat) alongside the r1 encoder remat.

nn.remat renames the wrapped auto-named submodules (ResNetFeatures_0 →
CheckpointResNetFeatures_0), which changes flax's rng folding, so the two
models are initialized separately and the non-remat weights are
transplanted positionally (the trees are congruent: one renamed key per
encoder scope, identical structure below).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tripled_tpu.config import ModelConfig
from tripled_tpu.models.registry import build_model


def _inputs(B=2, H=64, W=96):
    rng = np.random.RandomState(0)
    K = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    K[:, 0, 0] = 0.58 * W
    K[:, 1, 1] = 1.92 * H
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    mask = np.ones((B, H, W, 1), np.float32)
    mask[:, 16:32, 16:32] = 0.0
    return {
        "color": jnp.asarray(rng.rand(B, 3, H, W, 3), jnp.float32),
        "color_aug": jnp.asarray(rng.rand(B, 3, H, W, 3), jnp.float32),
        "K": jnp.asarray(K),
        "inv_K": jnp.asarray(np.linalg.inv(K)),
        "mask": jnp.asarray(mask),
    }


def _norm_path(path):
    """Normalize a key path by stripping nn.remat's Checkpoint scope-name
    prefix (ResNetFeatures_0 -> CheckpointResNetFeatures_0 etc.), so src
    and dst leaves are matched BY PATH, not positionally (ADVICE r2: flax
    flattens in sorted-key order, which the rename can reorder)."""
    out = []
    for k in path:
        s = getattr(k, "key", None)
        out.append(s.replace("Checkpoint", "") if isinstance(s, str) else k)
    return tuple(out)


def _transplant(src_tree, dst_tree):
    """Copy src leaves into dst's structure, matched by normalized path."""
    src = {
        _norm_path(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(src_tree)[0]
    }
    dst_flat, dst_def = jax.tree_util.tree_flatten_with_path(dst_tree)
    assert len(src) == len(dst_flat)
    leaves = []
    for p, leaf in dst_flat:
        key = _norm_path(p)
        assert key in src, f"no source leaf for {key}"
        assert src[key].shape == leaf.shape, (key, src[key].shape, leaf.shape)
        leaves.append(src[key])
    return jax.tree_util.tree_unflatten(dst_def, leaves)


@pytest.mark.parametrize("name", ["mono_fm", "mono_fm_joint_inpaint_disentangle"])
def test_remat_matches_no_remat(name):
    H, W = 64, 96
    kwargs = dict(
        name=name, depth_num_layers=18, pose_num_layers=18,
        extractor_num_layers=18, height=H, width=W,
        pose_height=H, pose_width=W, perception_weight=1e-3,
    )
    if "disentangle" in name:
        kwargs.update(
            disentangle_layers=(False, False, False, False, True),
            auto_res_weight=5e-3,
        )
    inputs = _inputs(H=H, W=W)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "automask": jax.random.PRNGKey(2),
        "crop": jax.random.PRNGKey(3),
        "rotation": jax.random.PRNGKey(4),
    }

    base_model = build_model(ModelConfig(**kwargs, remat=False))
    base_vars = base_model.init(rngs, inputs, train=True)
    remat_model = build_model(ModelConfig(**kwargs, remat=True))
    remat_vars = remat_model.init(rngs, inputs, train=True)

    params_r = _transplant(base_vars["params"], remat_vars["params"])
    stats_r = _transplant(base_vars["batch_stats"], remat_vars["batch_stats"])

    def loss_and_grads(model, params, stats):
        def loss_fn(p):
            (_, loss_dict), _ = model.apply(
                {"params": p, "batch_stats": stats},
                inputs, train=True, rngs=rngs, mutable=["batch_stats"],
            )
            return sum(jnp.asarray(v) for v in loss_dict.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), jax.tree_util.tree_leaves(grads)

    loss_a, grads_a = loss_and_grads(
        base_model, base_vars["params"], base_vars["batch_stats"]
    )
    loss_b, grads_b = loss_and_grads(remat_model, params_r, stats_r)

    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    assert len(grads_a) == len(grads_b)
    # remat changes fusion/reduction order -> pure float-reassociation noise
    # in the backward's bf16-multipass conv accumulations (loss itself
    # matches to 1e-6; observed grad diffs: <0.8% of elements, max abs
    # ~2e-4 on grads of magnitude ~1e-2). atol bounds the absolute drift;
    # a real semantic difference (dropped loss term, wrong mask) would
    # shift grads by their own magnitude (~1e-2)
    for a, b in zip(grads_a, grads_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
