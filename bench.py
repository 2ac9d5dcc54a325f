"""Benchmark: single-chip training throughput (imgs/sec).

Measures TWO configs (VERDICT r1 item 4):
  - mono_fm R50/R18 @192x640 (cfg_kitti_fm.py geometry, bs48+remat
    single-chip sweet spot) — primary metric, comparable across rounds.
  - TripleD flagship mono_fm_joint_inpaint_disentangle R50 @320x1024 bs8
    with remat (the paper config, cfg_kitti_tripleD.py:5-7,23-53) — in the
    `also` field of the same JSON line.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
`vs_baseline` is measured: REF_TORCH_CPU_BASELINE.json holds the reference
torch implementation's own train-step throughput on this host's CPU
(produced by `python -m tripled_tpu.cli.bench_ref_torch`; the reference
publishes no numbers and no GPU exists here — BASELINE.md). If that file is
absent the ratio is null, never an assumed constant. `baseline_source`
labels the denominator explicitly.

Env overrides: BENCH_BATCH (default 48), BENCH_STEPS (default 20),
BENCH_MODE=train|infer, BENCH_PALLAS=1, BENCH_REMAT (default 1),
BENCH_SKIP_FLAGSHIP=1.
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def _baseline(config_key):
    try:
        with open(os.path.join(REPO, "REF_TORCH_CPU_BASELINE.json")) as f:
            data = json.load(f)
        return float(data["configs"][config_key]["imgs_per_sec"])
    except Exception:
        return None


def _vs(value, baseline):
    return round(value / baseline, 3) if baseline else None


def _inputs(batch, height, width):
    rng = np.random.RandomState(0)
    K = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    K[:, 0, 0] = 0.58 * width
    K[:, 1, 1] = 1.92 * height
    K[:, 0, 2] = 0.5 * width
    K[:, 1, 2] = 0.5 * height
    out = {
        "color": np.asarray(rng.rand(batch, 3, height, width, 3), np.float32),
        "color_aug": np.asarray(
            rng.rand(batch, 3, height, width, 3), np.float32
        ),
        "K": K,
        "inv_K": np.linalg.inv(K).astype(np.float32),
    }
    return out


def _build(cfg, batch):
    import jax

    from tripled_tpu.config import OptimConfig
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    model = build_model(cfg)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=2), steps_per_epoch=100)
    inputs = _inputs(batch, cfg.height, cfg.width)
    if "inpaint" in cfg.name:
        mask = np.ones((batch, cfg.height, cfg.width, 1), np.float32)
        r = np.random.RandomState(1)
        for _ in range(16):
            i = r.randint(0, cfg.height - 16)
            j = r.randint(0, cfg.width - 16)
            mask[:, i : i + 16, j : j + 16] = 0.0
        inputs["mask"] = mask
    inputs = jax.device_put(inputs)
    state = create_train_state(model, tx, inputs, seed=0)
    step = make_train_step(model, tx, donate=True)
    return state, step, inputs


def _time_steps(state, step, inputs, steps, windows=3):
    """Best-of-N timing windows: the 1-core host's dispatch floor wobbles
    ~2x under background load (BASELINE.md), so the fastest window is the
    reproducible number."""
    import jax

    rng = jax.random.PRNGKey(0)
    for _ in range(3):  # warmup / compile
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    jax.block_until_ready(state.params)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            rng, r = jax.random.split(rng)
            state, metrics = step(state, inputs, r)
        jax.block_until_ready(state.params)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_mono_fm(batch, steps):
    from tripled_tpu.config import ModelConfig

    cfg = ModelConfig(
        name="mono_fm",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        height=192,
        width=640,
        perception_weight=1e-3,
        use_pallas_photometric=os.environ.get("BENCH_PALLAS", "0") == "1",
        # remat default ON: recomputing activations frees HBM for 2x the
        # batch (bs48 fits, 8685 imgs/s vs 4094 @bs24 f32-saved) and the
        # ~7 ms host-dispatch floor makes images-per-dispatch the lever
        remat=os.environ.get("BENCH_REMAT", "1") == "1",
    )
    state, step, inputs = _build(cfg, batch)
    dt = _time_steps(state, step, inputs, steps)
    return batch * steps / dt


def bench_flagship(batch, steps):
    from tripled_tpu.config import ModelConfig

    cfg = ModelConfig(
        name="mono_fm_joint_inpaint_disentangle",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        height=320,
        width=1024,
        disentangle_layers=(False, False, False, False, True),
        depth_disentangle_type="use_half",
        auto_res_weight=5e-3,
        perception_weight=1e-3,
        remat=True,
    )
    state, step, inputs = _build(cfg, batch)
    dt = _time_steps(state, step, inputs, steps)
    return batch * steps / dt


def bench_infer(steps=50):
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return steps / best


def _with_oom_fallback(fn, batch, steps):
    while batch >= 1:
        try:
            return fn(batch, steps), batch
        except Exception as e:
            oom = "RESOURCE_EXHAUSTED" in str(e) or "Ran out of memory" in str(e)
            if oom and batch > 1:
                batch //= 2
                continue
            raise


def main():
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODE", "train")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "48"))

    if mode == "infer":
        fps = bench_infer(steps=max(steps, 20))
        print(
            json.dumps(
                {
                    "metric": "infer_fps_640x192_tripleD_r50",
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "vs_baseline": None,
                    "baseline_source": "none (reference publishes no FPS)",
                }
            )
        )
        return

    ips, used_batch = _with_oom_fallback(bench_mono_fm, batch, steps)
    base_fm = _baseline("mono_fm_r50_192x640")
    result = {
        "metric": f"train_imgs_per_sec_mono_fm_r50_bs{used_batch}_192x640"
        + ("_remat" if os.environ.get("BENCH_REMAT", "1") == "1" else ""),
        "value": round(ips, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": _vs(ips, base_fm),
        "baseline_source": (
            "reference torch full train step on this host's CPU "
            "(REF_TORCH_CPU_BASELINE.json; reference publishes no GPU "
            "numbers, no GPU in environment)"
            if base_fm
            else "unmeasured (run tripled_tpu.cli.bench_ref_torch)"
        ),
        "also": [],
    }

    if os.environ.get("BENCH_SKIP_FLAGSHIP", "0") != "1":
        fips, fbatch = _with_oom_fallback(
            bench_flagship, int(os.environ.get("BENCH_FLAGSHIP_BATCH", "8")),
            steps,
        )
        base_fs = _baseline("tripleD_r50_320x1024")
        result["also"].append(
            {
                "metric": (
                    f"train_imgs_per_sec_tripleD_r50_bs{fbatch}_320x1024_remat"
                ),
                "value": round(fips, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": _vs(fips, base_fs),
            }
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
