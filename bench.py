"""Benchmark: single-chip training throughput (imgs/sec), honestly timed.

Measures (VERDICT r1 item 4, r3 items 2/3/7):
  - mono_fm R50/R18 @192x640 (cfg_kitti_fm.py geometry) — primary metric,
    comparable across rounds under the stable id
    `train_imgs_per_sec_mono_fm_r50_192x640` (batch/remat are fields).
  - TripleD flagship mono_fm_joint_inpaint_disentangle R50 @320x1024 with
    remat (the paper config, cfg_kitti_tripleD.py:5-7,23-53) — in `also`.
  - the bit-exact configuration (f32 compute, exact warp — ModelConfig
    defaults) at its own best batch, under
    `train_imgs_per_sec_mono_fm_r50_192x640_exact`, so parity-mode perf is
    tracked beside the speed-mode headline every round (VERDICT r3 item 7).
  - end-to-end throughput through the REAL host input pipeline
    (synthetic on-disk KITTI tree -> BatchLoader -> prefetch_to_device ->
    train step), cold and warm-cache epochs, under
    `train_imgs_per_sec_mono_fm_r50_192x640_e2e` (VERDICT r3 item 2).

Every `_with_oom_fallback` result records `requested_batch` and
`fallback`: a silent batch halving can no longer masquerade as the
intended config (VERDICT r3 item 3).

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

Driver robustness (VERDICT r4 item 1): each metric row is printed as its
OWN flushed JSON line the moment it is measured — headline first, then
flagship, exact, e2e — so a driver timeout still leaves parseable rows in
the output tail (BENCH_r04.json was rc=124/parsed:null because the old
bench printed one JSON only after ALL rows finished). An internal
wall-clock budget (BENCH_BUDGET_S, default 1800 s) skips remaining
optional rows with an explicit `"skipped"` row instead of overrunning,
and per-row start/end timestamps go to stderr so a future timeout is
diagnosable. A final combined line (headline row + `"also"` list)
restates everything for single-line consumers.

Env overrides: BENCH_BATCH (default 16: best honest mono_fm config),
BENCH_STEPS (default 20), BENCH_MODE=train|infer, BENCH_PALLAS=1,
BENCH_REMAT (default 0), BENCH_BLOCK_WARP (default 1: 2x2 block-gather
warp; 0 = bit-exact warp), BENCH_BF16 (default 1; 0 = f32),
BENCH_BF16_WARP=1 (bf16 gather texels), BENCH_EQPOOL (default 0:
tie-averaged eq-mask CRP pool backward, PARITY.md deviations),
BENCH_SKIP_FLAGSHIP=1,
BENCH_FLAGSHIP_BATCH (default 8 under bf16, 4 under f32),
BENCH_FLAGSHIP_REMAT (default 1), BENCH_EXACT (default 1; 0 skips the
bit-exact row), BENCH_EXACT_BATCH (default 8: best known exact-mode batch),
BENCH_E2E (default 1; 0 skips the input-pipeline row), BENCH_E2E_EPOCHS
(default 4), BENCH_E2E_TREE (fixture dir, default /tmp/bench_e2e_kitti).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

_T0 = time.monotonic()


def _elapsed():
    return time.monotonic() - _T0


def _log(msg):
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(row):
    """Print one metric row as its own flushed JSON line (VERDICT r4 #1):
    partial progress must survive a driver timeout."""
    print(json.dumps(row), flush=True)
    _log(f"emitted {row.get('metric')}")

# v5e (TPU v5 lite) bf16 peak. A measurement implying more than this is a
# broken clock, not a fast program.
PEAK_TFLOPS = 197.0


def _env1(name, default="1"):
    return os.environ.get(name, default) == "1"


def _baseline(config_key):
    try:
        with open(os.path.join(REPO, "REF_TORCH_CPU_BASELINE.json")) as f:
            data = json.load(f)
        return float(data["configs"][config_key]["imgs_per_sec"])
    except Exception:
        return None


def _vs(value, baseline):
    return round(value / baseline, 3) if baseline else None


# --------------------------------------------------------------- configs
# Single source of truth for the benchmarked model configs; dev/
# profile_step.py and dev/dump_hlo.py import these so published profiles
# always match the bench operating point (VERDICT r3 item 1).


def mono_fm_cfg(exact: bool = False):
    """The mono_fm bench config. exact=True pins the bit-exact-vs-torch
    numerics (f32 compute, exact f32 warp) regardless of env speed flags."""
    from tripled_tpu.config import ModelConfig

    return ModelConfig(
        name="mono_fm",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        height=192,
        width=640,
        perception_weight=1e-3,
        use_pallas_photometric=_env1("BENCH_PALLAS"),
        remat=_env1("BENCH_REMAT", "0"),
        warp_gather_dtype=(
            "bfloat16"
            if not exact and _env1("BENCH_BF16_WARP")
            else "float32"
        ),
        warp_block_gather=not exact and _env1("BENCH_BLOCK_WARP"),
        warp_block_shape=tuple(
            int(v)
            for v in os.environ.get("BENCH_BLOCK_SHAPE", "2,2").split(",")
        ),
        warp_block_features=not exact and _env1("BENCH_BLOCK_FEATURES", "0"),
        pool_eqmask_grad=not exact and _env1("BENCH_EQPOOL", "0"),
        compute_dtype=(
            "bfloat16" if not exact and _env1("BENCH_BF16") else "float32"
        ),
    )


def flagship_cfg():
    from tripled_tpu.config import ModelConfig

    if _env1("BENCH_BF16_WARP"):
        # bf16 64-lane patch tensors at 320x1024 bs8 are 1.35 GB/frame;
        # allow the fast-gather mode (default cap 1 GB was set for f32
        # mono_fm bs48 - BASELINE.md round-3 log)
        os.environ.setdefault("TRIPLED_WARP_PAD64_CAP", "1500000000")

    return ModelConfig(
        name="mono_fm_joint_inpaint_disentangle",
        depth_num_layers=50,
        pose_num_layers=18,
        extractor_num_layers=50,
        use_pallas_photometric=_env1("BENCH_PALLAS"),
        height=320,
        width=1024,
        disentangle_layers=(False, False, False, False, True),
        depth_disentangle_type="use_half",
        auto_res_weight=5e-3,
        perception_weight=1e-3,
        remat=_env1("BENCH_FLAGSHIP_REMAT"),
        warp_gather_dtype=(
            "bfloat16" if _env1("BENCH_BF16_WARP") else "float32"
        ),
        warp_block_gather=_env1("BENCH_BLOCK_WARP"),
        pool_eqmask_grad=_env1("BENCH_EQPOOL", "0"),
        compute_dtype="bfloat16" if _env1("BENCH_BF16") else "float32",
    )


def _dtype_fields(exact: bool = False):
    return {
        "compute_dtype": (
            "bfloat16" if not exact and _env1("BENCH_BF16") else "float32"
        ),
        "warp_block_gather": not exact and _env1("BENCH_BLOCK_WARP"),
        "warp_gather_dtype": (
            "bfloat16"
            if not exact and _env1("BENCH_BF16_WARP")
            else "float32"
        ),
        "pool_eqmask_grad": not exact and _env1("BENCH_EQPOOL", "0"),
    }


# ----------------------------------------------------------------- build


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
    return _measure(mono_fm_cfg(), batch, steps)


def bench_mono_fm_exact(batch, steps):
    return _measure(mono_fm_cfg(exact=True), batch, steps)


def bench_flagship(batch, steps):
    return _measure(flagship_cfg(), batch, steps)


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


# ------------------------------------------------------------------- e2e


def bench_e2e(batch, epochs):
    """Throughput through the REAL input pipeline (VERDICT r3 item 2):
    on-disk KITTI tree (synthetic frames at native 375x1242) -> MonoDataset
    decode/resize/aug -> BatchLoader threads -> prefetch_to_device ->
    jitted train step. Epoch 0 is the cold-cache epoch (JPEG/PNG decode +
    Lanczos); later epochs hit the in-RAM uint8 decode cache. Each epoch
    window ends in a forced loss readback."""
    import jax

    from tripled_tpu.config import DataConfig, OptimConfig
    from tripled_tpu.data.get_dataset import get_dataset
    from tripled_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from tripled_tpu.data.synthetic import make_kitti_tree
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    root = os.environ.get("BENCH_E2E_TREE", "/tmp/bench_e2e_kitti")
    # >=400 samples so warm epochs reach steady state (VERDICT r4 item 6:
    # the 80-sample fixture was still accelerating at epoch 4)
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "402"))
    marker = os.path.join(root, "splits", "synthetic", "train_files.txt")
    if not os.path.exists(marker) or len(open(marker).readlines()) != n_frames - 2:
        make_kitti_tree(root, num_frames=n_frames, height=375, width=1242)
    os.environ["TRIPLED_SPLITS_DIR"] = os.path.join(root, "splits")

    cfg = mono_fm_cfg()
    data_cfg = DataConfig(
        name="kitti",
        split="synthetic",
        in_path=root,
        height=cfg.height,
        width=cfg.width,
        batch_size=batch,
        # the shipped host-pipeline fast path (CLAUDE.md host section):
        # in-RAM uint8 decode cache + on-device ColorJitter + uint8 frames
        # over the wire (4x smaller host->device transfer)
        decode_cache_mb=int(os.environ.get("BENCH_E2E_CACHE_MB", "4096")),
        device_color_aug=True,
        ship_uint8=True,
    )
    dataset = get_dataset(data_cfg, training=True)
    loader = BatchLoader(dataset, batch_size=batch, shuffle=True, seed=0)

    model = build_model(cfg)
    tx, _ = make_optimizer(OptimConfig(warmup_iters=2), steps_per_epoch=100)
    first = next(iter(loader))
    state = create_train_state(model, tx, jax.device_put(first), seed=0)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(0)
    # compile outside any timed window
    state, metrics = step(state, jax.device_put(first), rng)
    float(metrics["loss"])

    epoch_rates = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        n = 0
        t0 = time.perf_counter()
        for b in prefetch_to_device(iter(loader), size=2):
            rng, r = jax.random.split(rng)
            state, metrics = step(state, b, r)
            n += batch
        loss = float(metrics["loss"])  # forced readback closes the window
        dt = time.perf_counter() - t0
        assert np.isfinite(loss)
        epoch_rates.append(n / dt)
    # steady state = best warm epoch (cache fully hot); the full curve is
    # reported so an unconverged run is visible
    warm = sorted(epoch_rates[1:])
    return {
        "imgs_per_sec": warm[-1] if warm else epoch_rates[0],
        "cold_epoch_imgs_per_sec": epoch_rates[0],
        "epoch_rates": [round(r, 2) for r in epoch_rates],
        "steps_per_epoch": len(loader),
        "dataset_frames": n_frames,
    }


def _with_oom_fallback(fn, batch, steps):
    import gc

    requested = batch
    while batch >= 1:
        try:
            return fn(batch, steps), batch, requested
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


def _row(metric, m, batch, requested, remat, exact=False, extra=None):
    row = {
        "metric": metric,
        "value": round(m["imgs_per_sec"], 2),
        "unit": "imgs/sec/chip",
        "batch": batch,
        "requested_batch": requested,
        "fallback": batch != requested,
        "remat": remat,
        **_dtype_fields(exact),
        "ms_per_step": round(m["ms_per_step"], 1),
        "flops_per_step": m["flops_per_step"],
        "tflops_per_sec": round(m["tflops_per_sec"], 2)
        if m.get("tflops_per_sec")
        else None,
        "mfu": round(m["mfu"], 4) if m.get("mfu") else None,
        "sync_method": "loss_scalar_readback",
    }
    if extra:
        row.update(extra)
    return row


def main():
    from tripled_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    mode = os.environ.get("BENCH_MODE", "train")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))

    if mode == "infer":
        fps = bench_infer(steps=max(steps, 20))
        _emit(
            {
                "metric": "infer_fps_640x192_tripleD_r50",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": None,
                "baseline_source": "none (reference publishes no FPS)",
                "sync_method": "host_readback",
            }
        )
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))
    _log(f"budget {budget:.0f}s; headline config: batch={batch} steps={steps}")

    # ---- headline row: mandatory, measured and EMITTED first -----------
    _log("start headline mono_fm")
    m, used_batch, requested = _with_oom_fallback(bench_mono_fm, batch, steps)
    base_fm = _baseline("mono_fm_r50_192x640")
    result = _row(
        # stable id across rounds (ADVICE r2): batch/remat are fields
        "train_imgs_per_sec_mono_fm_r50_192x640",
        m,
        used_batch,
        requested,
        _env1("BENCH_REMAT", "0"),
        extra={
            "vs_baseline": _vs(m["imgs_per_sec"], base_fm),
            "baseline_source": (
                "reference torch full train step on this host's CPU "
                "(REF_TORCH_CPU_BASELINE.json; reference publishes no GPU "
                "numbers, no GPU in environment)"
                if base_fm
                else "unmeasured (run tripled_tpu.cli.bench_ref_torch)"
            ),
        },
    )
    _emit(result)
    result["also"] = []

    # ---- optional rows: budget-gated, each emitted when measured -------
    def optional(metric, reserve_s, fn):
        """Run one optional row under the wall-clock budget. A row whose
        estimated cost no longer fits is recorded as an explicit skip; a
        row that crashes is recorded as an error — either way the driver
        tail stays parseable and later rows still run."""
        if _elapsed() + reserve_s > budget:
            row = {
                "metric": metric,
                "skipped": True,
                "reason": (
                    f"budget: {_elapsed():.0f}s elapsed + ~{reserve_s:.0f}s "
                    f"estimated > BENCH_BUDGET_S={budget:.0f}"
                ),
            }
        else:
            _log(f"start {metric} (reserve ~{reserve_s:.0f}s)")
            try:
                row = fn()
            except Exception as e:  # noqa: BLE001 — keep later rows alive
                row = {
                    "metric": metric,
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
        _emit(row)
        result["also"].append(row)

    def flagship_row():
        default_fb = "8" if _env1("BENCH_BF16") else "4"
        fm, fbatch, freq = _with_oom_fallback(
            bench_flagship,
            int(os.environ.get("BENCH_FLAGSHIP_BATCH", default_fb)),
            steps,
        )
        return _row(
            "train_imgs_per_sec_tripleD_r50_320x1024",
            fm,
            fbatch,
            freq,
            _env1("BENCH_FLAGSHIP_REMAT"),
            extra={
                "vs_baseline": _vs(
                    fm["imgs_per_sec"], _baseline("tripleD_r50_320x1024")
                )
            },
        )

    def exact_row():
        eb = int(os.environ.get("BENCH_EXACT_BATCH", "8"))
        em, ebatch, ereq = _with_oom_fallback(bench_mono_fm_exact, eb, steps)
        return _row(
            "train_imgs_per_sec_mono_fm_r50_192x640_exact",
            em,
            ebatch,
            ereq,
            _env1("BENCH_REMAT", "0"),
            exact=True,
            extra={"vs_baseline": _vs(em["imgs_per_sec"], base_fm)},
        )

    def e2e_row():
        epochs = int(os.environ.get("BENCH_E2E_EPOCHS", "4"))
        e2e = bench_e2e(batch, epochs)
        return {
            "metric": "train_imgs_per_sec_mono_fm_r50_192x640_e2e",
            "value": round(e2e["imgs_per_sec"], 2),
            "unit": "imgs/sec/chip",
            "batch": batch,
            "cold_epoch_imgs_per_sec": round(
                e2e["cold_epoch_imgs_per_sec"], 2
            ),
            "epoch_rates": e2e["epoch_rates"],
            "steps_per_epoch": e2e["steps_per_epoch"],
            "dataset_frames": e2e["dataset_frames"],
            **_dtype_fields(),
            "pipeline": (
                "on-disk 375x1242 tree -> decode cache -> BatchLoader "
                "threads -> uint8 transfer -> device jitter -> step"
            ),
            "sync_method": "loss_scalar_readback",
        }

    # Reserves are warm-cache estimates (compile + 3 timing windows); with
    # a cold compile cache the headline eats the budget and the rest skip
    # explicitly instead of the whole process timing out silently.
    if not _env1("BENCH_SKIP_FLAGSHIP", "0"):
        optional(
            "train_imgs_per_sec_tripleD_r50_320x1024",
            float(os.environ.get("BENCH_RESERVE_FLAGSHIP_S", "600")),
            flagship_row,
        )
    if _env1("BENCH_EXACT"):
        optional(
            "train_imgs_per_sec_mono_fm_r50_192x640_exact",
            float(os.environ.get("BENCH_RESERVE_EXACT_S", "300")),
            exact_row,
        )
    if _env1("BENCH_E2E"):
        optional(
            "train_imgs_per_sec_mono_fm_r50_192x640_e2e",
            float(os.environ.get("BENCH_RESERVE_E2E_S", "540")),
            e2e_row,
        )

    # final combined line for single-line consumers: headline + also
    print(json.dumps(result), flush=True)
    _log("done")


if __name__ == "__main__":
    main()
