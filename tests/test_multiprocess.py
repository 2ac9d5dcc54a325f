"""2-process jax.distributed smoke test (VERDICT r1 weak-spot 4): the
multi-host path — `jax.distributed.initialize`, a global mesh over both
processes, `make_array_from_process_local_data` batch assembly, and the
rank-strided evaluator gather — exercised with two real OS processes on
the CPU backend (4 virtual devices each → 8 global)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, os, sys
proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=proc_id,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

import numpy as np
from tripled_tpu.config import ModelConfig, OptimConfig
from tripled_tpu.models.registry import build_model
from tripled_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from tripled_tpu.train.optim import make_optimizer
from tripled_tpu.train.state import create_train_state
from tripled_tpu.train.step import make_train_step
from tripled_tpu.utils.inputs import dummy_train_inputs

cfg = ModelConfig(
    name="mono_baseline", depth_num_layers=18, pose_num_layers=18,
    height=32, width=64, pose_height=32, pose_width=64, automask=False,
)
model = build_model(cfg)
tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=4)

global_batch = dummy_train_inputs(cfg, 8, seed=0)
# each process owns its contiguous half (BatchLoader shard convention)
local = {k: v[proc_id * 4 : (proc_id + 1) * 4] for k, v in global_batch.items()}

mesh = make_mesh()
state = create_train_state(model, tx, jax.device_put(local), seed=0)
state = jax.device_put(state, replicated_sharding(mesh))
sharded = shard_batch(local, mesh)
step = make_train_step(model, tx, donate=False)
state, metrics = step(state, sharded, jax.random.PRNGKey(5))
loss = float(metrics["loss"])

# rank-strided evaluator on a fake dataset; must equal the sequential result
from tripled_tpu.eval.evaluator import DepthEvaluator

class FakeDataset:
    def __init__(self, n=10):
        rng = np.random.RandomState(0)
        self.imgs = rng.rand(n, 1, 32, 64, 3).astype(np.float32)
        self.gt_depths = [
            rng.rand(40, 80).astype(np.float64) * 30 + 1 for _ in range(n)
        ]
    def __len__(self):
        return len(self.imgs)
    def sample(self, i, rng):
        return {"color": self.imgs[i]}

def predict(variables, imgs):
    import jax.numpy as jnp
    return 1.0 / (1.0 + jnp.mean(imgs[:, 0], axis=-1, keepdims=True) * 5.0)

ds = FakeDataset()
sharded_eval = DepthEvaluator(predict, ds, batch_size=2).run({})
seq_eval = DepthEvaluator(
    predict, ds, batch_size=2, shard_across_processes=False
).run({})

print("RESULT " + json.dumps({
    "proc": proc_id,
    "loss": loss,
    "abs_rel_sharded": sharded_eval["abs_rel"],
    "abs_rel_seq": seq_eval["abs_rel"],
    "rmse_sharded": sharded_eval["rmse"],
    "rmse_seq": seq_eval["rmse"],
}))
sys.stdout.flush()
# Exit without jax's atexit shutdown barrier: on the contended 1-core CI
# host one process can lag past the barrier timeout and 'fail' after all
# assertions passed (observed: 'Shutdown barrier in coordination service
# has failed'). Shutdown semantics are not what this test checks.
try:
    jax.distributed.shutdown()
except Exception as e:
    print("shutdown barrier warning (ignored):", e)
os._exit(0)
"""


def test_two_process_distributed_train_and_eval(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    # generous: both workers share ONE host core with the rest of the
    # suite; standalone this finishes in ~5 min, contended it can triple
    outs = [p.communicate(timeout=2700)[0] for p in procs]
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-2000:]
        results.append(json.loads(line[-1][len("RESULT "):]))

    # both processes computed the same global loss (grad all-reduce) and the
    # rank-strided evaluator reproduced the sequential metrics exactly
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
    # sharded gather re-orders the per-image float accumulation, so allow
    # accumulation-order noise but nothing protocol-level
    for r in results:
        np.testing.assert_allclose(
            r["abs_rel_sharded"], r["abs_rel_seq"], rtol=1e-6
        )
        np.testing.assert_allclose(
            r["rmse_sharded"], r["rmse_seq"], rtol=1e-6
        )
    assert results[0]["abs_rel_sharded"] == results[1]["abs_rel_sharded"]
