"""Exact-vs-block-warp training trajectory A/B (same init, same data):
evidence that warp_block_gather does not alter training dynamics beyond
float noise at discontinuities."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses, json
import numpy as np
import jax.numpy as jnp
from tripled_tpu.config import ModelConfig, OptimConfig
from tripled_tpu.models import build_model, canonicalize
from tripled_tpu.train.optim import make_optimizer
from tripled_tpu.train.state import create_train_state
from tripled_tpu.train.step import make_train_step
from tripled_tpu.utils.inputs import dummy_train_inputs

base = canonicalize(ModelConfig(
    name="mono_fm", depth_num_layers=18, pose_num_layers=18,
    extractor_num_layers=18, height=96, width=320,
    perception_weight=1e-3, depth_dropout_rate=0.0))
K = 12
batches = [dummy_train_inputs(base, 4, seed=100 + i) for i in range(K)]

def run(block):
    cfg = dataclasses.replace(base, warp_block_gather=block)
    model = build_model(cfg)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=4), steps_per_epoch=K)
    state = create_train_state(model, tx, batches[0], seed=7)
    step = make_train_step(model, tx, donate=False)
    losses = []
    for i, b in enumerate(batches):
        state, m = step(state, b, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    return losses

le = run(False)
lb = run(True)
rel = [abs(a - b) / abs(a) for a, b in zip(le, lb)]
out = {"exact": le, "block": lb, "max_rel": max(rel), "final_rel": rel[-1]}
print(json.dumps(out, indent=1))
with open("/tmp/traj_block_ab.json", "w") as f:
    json.dump(out, f)
