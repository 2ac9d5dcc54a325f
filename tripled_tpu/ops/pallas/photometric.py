"""Fused photometric min-reprojection Pallas kernel.

The per-scale hot loop of every model variant evaluates, for K candidate
images (warped sources + automask identity sources) against the target:

    loss_k = 0.85 * mean_c(SSIM_3x3(pred_k, target)) +
             0.15 * mean_c(robust_l1(pred_k, target))
    out    = min_k loss_k          (+ argmin for masking / analysis)

(`mono/model/mono_fm_joint/net.py:67-71,109-128`). The XLA path materializes
K SSIM pipelines (5 box filters each) and K HBM loss maps. This kernel fuses
the entire comparison for all K candidates into one VMEM pass over row tiles:
each (batch, row-tile) grid step reads the reflection-padded target and the K
padded candidates once, computes the five 3×3 box sums as shifted-slice
accumulations in registers/VMEM, and writes only the (H, W) min map and an
int32 argmin.

Layout notes (TPU): planar channel layout (C, rows, W+2) so x-shifts are
plain lane slices; the y halo comes from overlapping row-window DMAs of the
pre-padded input (inputs stay in HBM via memory_space=ANY). Min/argmin stay
in VMEM.

Backward: hand-derived fused Pallas kernel (`_backward_overlap`, r2). The
SSIM gradient at every window member decomposes into three per-output-pixel
coefficient maps (see its docstring), so one VMEM pass recomputes the K
candidate stats, gates by argmin, applies a 3×3 transpose-window-sum, and
adds the local robust-L1 term — no autodiff re-materialization, inputs and
outputs touched exactly once. Validated against XLA autodiff (≤2e-5) in
tests/test_pallas_photometric.py and on-chip.

Measured on a v5e chip (bs12 @192×640, K=4, f32, random data):
  forward: 2.19 ms Pallas vs 2.87 ms XLA (1.31×)
  backward alone: 6.98 ms Pallas vs 7.22 ms recompute-VJP
  full grad: 8.33 ms Pallas fwd+bwd vs 7.93 ms pure-XLA fwd+bwd
The r1/r2 "loses ~5% end-to-end" verdict was broken-clock fiction: the
first honest-clock A/B (round 3, BASELINE.md round-3 log) measured
36.16 imgs/s fused vs 35.49 XLA (+1.9%) on the mono_fm bench config, so
`use_pallas_photometric` defaults ON for TPU backends on shapes
`supports_shape` accepts (W % 128 == 0 and the scoped-VMEM slab ≤ 14 MB);
everything else falls back to the XLA path in net.py. The kernel's
deterministic-identity tie-break (vs the reference's 1e-5 noise) is
re-validated on static frames in tests/test_pallas_photometric.py and
PARITY_TRAIN.json `pallas_tiebreak` (round 4; PARITY.md "Known
intentional deviations"). The kernel gates per-tile on candidate
activity, so real automasked training data (large static regions → 1-2
active candidates/tile) widens the win further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tripled_tpu.ops.losses import reprojection_loss

_C1 = 0.01**2
_C2 = 0.03**2


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def supports_shape(height: int, width: int) -> bool:
    """Mosaic constraints, verified on-device:

    1. Lane alignment: the kernel slices W lanes out of its 128-padded
       VMEM slabs, and lane-dim slices must be 128-aligned (a W=192 config
       fails to compile with 'Slice shape along dimension 2 must be
       aligned to tiling (128)'). Training widths 640/1024 qualify.
    2. Scoped VMEM: despite the HBM in_specs, the compiler stages one
       batch item's full (K, C, total_rows, WP) candidate slab per grid
       step in scoped VMEM; the step fails to compile once that exceeds
       the 16 MB limit ('Scoped allocation with size 17.29M ... exceeded
       scoped vmem limit', flagship 320x1024 → 18.1 MB staged; mono_fm
       192x640 → 7.4 MB, fine). Gate with a 14 MB margin so 320x1024
       falls back to the XLA path instead of failing the whole compile.

    H only needs 8-sublane DMA windows, which the row-tile picker already
    guarantees for any H."""
    if width % 128 != 0:
        return False
    th = next(
        (t for t in range(16, 7, -1) if height % t == 0 and t % 8 == 0),
        height,
    )
    win = -((th + 2) // -8) * 8
    total_rows = height - th + win
    wp = -((width + 2) // -128) * 128
    k, c = 4, 3  # worst-case candidate count (2 warped + 2 identity), RGB
    staged = k * c * total_rows * wp * 4
    return staged <= 14 * 2**20


def _kernel(tgt_ref, preds_ref, out_ref, idx_ref, *, K, TH, W, C):
    """Grid step: one (batch, row-tile).

    tgt_ref:   (C, TH+2, W+2) padded target rows (planar channels)
    preds_ref: (K, C, TH+2, W+2) padded candidates
    out_ref:   (TH, W) min loss; idx_ref: (TH, W) int32 argmin
    """

    def channel_loss(x, y):
        # x, y: (TH+2, W+2) single-channel padded tiles
        sx = jnp.zeros((TH, W), jnp.float32)
        sy = jnp.zeros((TH, W), jnp.float32)
        sxx = jnp.zeros((TH, W), jnp.float32)
        syy = jnp.zeros((TH, W), jnp.float32)
        sxy = jnp.zeros((TH, W), jnp.float32)
        for di in range(3):
            for dj in range(3):
                xs = x[di : di + TH, dj : dj + W]
                ys = y[di : di + TH, dj : dj + W]
                sx += xs
                sy += ys
                sxx += xs * xs
                syy += ys * ys
                sxy += xs * ys
        mu_x = sx / 9.0
        mu_y = sy / 9.0
        sigma_x = sxx / 9.0 - mu_x * mu_x
        sigma_y = syy / 9.0 - mu_y * mu_y
        sigma_xy = sxy / 9.0 - mu_x * mu_y
        n = (2 * mu_x * mu_y + _C1) * (2 * sigma_xy + _C2)
        d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
        ssim = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)
        cx = x[1 : 1 + TH, 1 : 1 + W]
        cy = y[1 : 1 + TH, 1 : 1 + W]
        l1 = jnp.sqrt((cy - cx) ** 2 + 1e-6)
        return 0.85 * ssim + 0.15 * l1

    best = jnp.full((TH, W), jnp.inf, jnp.float32)
    best_idx = jnp.zeros((TH, W), jnp.int32)
    for k in range(K):
        acc = jnp.zeros((TH, W), jnp.float32)
        for c in range(C):
            acc += channel_loss(
                preds_ref[k, c].astype(jnp.float32),
                tgt_ref[c].astype(jnp.float32),
            )
        loss_k = acc / C
        take = loss_k < best
        best = jnp.where(take, loss_k, best)
        best_idx = jnp.where(take, k, best_idx)
    out_ref[:] = best
    idx_ref[:] = best_idx


def _pad_hw(x):
    """Reflect-pad H and W by 1 (NHWC)."""
    return jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")


def _forward_overlap(target, preds, row_tile, interpret):
    """Row-tiled forward. BlockSpec index maps address non-overlapping
    blocks, but SSIM tiles need a 1-row halo; so the padded inputs stay in
    HBM (memory_space=ANY) and each grid step DMAs its overlapping
    (TH+2)-row window into VMEM scratch explicitly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, H, W, C = preds.shape
    # Pick a row tile: a multiple of 8 dividing H (aligned DMA offsets);
    # otherwise fall back to a single tile (offset 0 is trivially aligned).
    cand = [t for t in range(min(row_tile, H), 7, -1)
            if H % t == 0 and t % 8 == 0]
    TH = cand[0] if cand else H
    n_tiles = H // TH
    WIN = -((TH + 2) // -8) * 8  # DMA window rows, rounded up to 8 sublanes
    # total rows so the last window [H-TH, H-TH+WIN) stays in bounds
    total_rows = H - TH + WIN
    extra_rows = total_rows - (H + 2)
    # lane dim of the DMA'd slabs must be 128-aligned
    WP = -((W + 2) // -128) * 128
    extra_cols = WP - (W + 2)

    # planar channel layout: (B, C, total_rows, WP). Mosaic requires DMA
    # window shapes aligned to the (8, 128) tile, so windows are WIN rows by
    # the full padded width; the kernel reads the first TH+2 rows / W+2 cols.
    def _to_planes(x):
        return jnp.pad(x, [(0, 0), (0, extra_rows), (0, extra_cols), (0, 0)])

    tgt_p = _to_planes(_pad_hw(target)).transpose(0, 3, 1, 2)
    preds_p = _to_planes(
        _pad_hw(preds.reshape(B * K, H, W, C))
    ).reshape(B, K, total_rows, WP, C).transpose(0, 1, 4, 2, 3)

    def kernel(tgt_hbm, preds_hbm, out_ref, idx_ref, tgt_vmem, preds_vmem, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        row0 = t * TH
        if TH % 8 == 0:
            row0 = pl.multiple_of(row0, 8)
        cp1 = pltpu.make_async_copy(
            tgt_hbm.at[b, :, pl.ds(row0, WIN), :], tgt_vmem, sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            preds_hbm.at[b, :, :, pl.ds(row0, WIN), :], preds_vmem, sem.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        _kernel(
            tgt_vmem,
            preds_vmem,
            out_ref.at[0],
            idx_ref.at[0],
            K=K,
            TH=TH,
            W=W,
            C=C,
        )

    out, idx = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # ANY-space inputs must be whole-array blocks with a trivial
            # index map; the kernel slices its (batch, row-window) via DMA.
            pl.BlockSpec((B, C, total_rows, WP), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.HBM),
            pl.BlockSpec(
                (B, K, C, total_rows, WP), lambda b, t: (0, 0, 0, 0, 0),
                memory_space=pltpu.HBM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, W), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, WIN, WP), jnp.float32),
            pltpu.VMEM((K, C, WIN, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tgt_p.astype(jnp.float32), preds_p.astype(jnp.float32))
    return out, idx


def _backward_overlap(target, preds, g, idx, interpret):
    """Hand-derived fused backward kernel (VERDICT r1 item 3).

    Math: per output pixel o, the active (argmin) candidate's loss is
    0.85*clip(ssim)+0.15*robust_l1 averaged over channels. With
    n = n1*n2, d = d1*d2 (n1=2μxμy+C1, n2=2σxy+C2, d1=μx²+μy²+C1,
    d2=σx+σy+C2), the SSIM gradient w.r.t. any window member u decomposes as

        ∂loss_o/∂x_u = A_o + B_o*y_u + G_o*x_u
        ∂loss_o/∂y_u = A2_o + B_o*x_u + G_o*y_u

    with per-pixel coefficient maps (P = -0.425/C * g_o * 1[idx=k] * clipmask)

        Qn = P/d,  Qd = -P*n/d²
        A  = 2/9 * (Qn*μy*(n2-n1) + Qd*μx*(d2-d1))
        A2 = 2/9 * (Qn*μx*(n2-n1) + Qd*μy*(d2-d1))
        B  = 2/9 * Qn*n1,   G = 2/9 * Qd*d1

    so the input gradient is a 3×3 transpose-window-sum (boxT) of three
    coefficient maps plus the local L1 term:

        dx_u = boxT(A) + y_u*boxT(B) + x_u*boxT(G) + L1_u
        dy_u = Σ_k boxT(A2) + x_u*boxT(B) + y_u*boxT(G) - L1_u

    One grid step (batch, row-tile) reads the padded inputs once (same
    planar HBM layout as the forward, overlapping-window DMA), recomputes
    the K candidate stats in VMEM, and writes padded-geometry gradient
    tiles; only the reflect-pad fold runs outside.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, H, W, C = preds.shape
    Hp = H + 2
    S = 16 if H >= 16 else max(8, -(-Hp // 8) * 8 // 2)
    n_tiles = -(-Hp // S)
    R = n_tiles * S
    WIN = -((S + 4) // -8) * 8     # input DMA window rows
    GWIN = -((S + 2) // -8) * 8    # g/idx DMA window rows
    WP = -((W + 2) // -128) * 128
    WG = -(W // -128) * 128
    total_in_rows = (n_tiles - 1) * S + WIN
    total_g_rows = (n_tiles - 1) * S + GWIN

    def to_planes(x4):
        # (N, H, W, C) -> (N, C, total_in_rows, WP); content at row offset 2
        xp = _pad_hw(x4)
        xp = jnp.pad(
            xp,
            [(0, 0), (2, total_in_rows - 2 - Hp), (0, WP - (W + 2)), (0, 0)],
        )
        return xp.transpose(0, 3, 1, 2)

    tgt_p = to_planes(target).astype(jnp.float32)
    preds_p = (
        to_planes(preds.reshape(B * K, H, W, C))
        .reshape(B, K, C, total_in_rows, WP)
        .astype(jnp.float32)
    )
    g_p = jnp.pad(
        g.astype(jnp.float32),
        [(0, 0), (2, total_g_rows - 2 - H), (0, WG - W)],
    )
    idx_p = jnp.pad(
        idx.astype(jnp.int32),
        [(0, 0), (2, total_g_rows - 2 - H), (0, WG - W)],
        constant_values=-1,
    )

    WC = -((W + 4) // -128) * 128  # scratch width for boxT zero borders

    def kernel(tgt_hbm, preds_hbm, g_hbm, idx_hbm, dt_ref, dp_ref,
               tv, pv, gv, iv, cfbuf, l1buf, dyacc, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        p0 = pl.multiple_of(t * S, 8)
        copies = [
            pltpu.make_async_copy(
                tgt_hbm.at[b, :, pl.ds(p0, WIN), :], tv, sem.at[0]
            ),
            pltpu.make_async_copy(
                preds_hbm.at[b, :, :, pl.ds(p0, WIN), :], pv, sem.at[1]
            ),
            pltpu.make_async_copy(
                g_hbm.at[b, pl.ds(p0, GWIN), :], gv, sem.at[2]
            ),
            pltpu.make_async_copy(
                idx_hbm.at[b, pl.ds(p0, GWIN), :], iv, sem.at[3]
            ),
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        Sc = S + 2  # coefficient rows per tile

        def boxT(cf):
            # coef (Sc, W) -> dpad tile (S, W+2); zero borders come from the
            # scratch buffer (Mosaic rejects in-kernel jnp.pad concats)
            cfbuf[:] = jnp.zeros((Sc, WC), jnp.float32)
            cfbuf[:, 2 : 2 + W] = cf
            out = jnp.zeros((S, W + 2), jnp.float32)
            for di in range(3):
                for dj in range(3):
                    out = out + cfbuf[di : di + S, dj : dj + W + 2]
            return out

        gm = gv[0:Sc, 0:W]
        im = iv[0:Sc, 0:W]

        dyacc[:] = jnp.zeros((C, S, WP), jnp.float32)

        def _grad_one_candidate(k, gk):
            for c in range(C):
                x = pv[k, c]
                y = tv[c]
                sx = jnp.zeros((Sc, W), jnp.float32)
                sy = jnp.zeros((Sc, W), jnp.float32)
                sxx = jnp.zeros((Sc, W), jnp.float32)
                syy = jnp.zeros((Sc, W), jnp.float32)
                sxy = jnp.zeros((Sc, W), jnp.float32)
                for di in range(3):
                    for dj in range(3):
                        xs = x[di : di + Sc, dj : dj + W]
                        ys = y[di : di + Sc, dj : dj + W]
                        sx += xs
                        sy += ys
                        sxx += xs * xs
                        syy += ys * ys
                        sxy += xs * ys
                mu_x = sx / 9.0
                mu_y = sy / 9.0
                n1 = 2.0 * mu_x * mu_y + _C1
                n2 = 2.0 * (sxy / 9.0 - mu_x * mu_y) + _C2
                d1 = mu_x * mu_x + mu_y * mu_y + _C1
                d2 = (sxx / 9.0 - mu_x * mu_x) + (syy / 9.0 - mu_y * mu_y) + _C2
                n = n1 * n2
                d = d1 * d2
                s_raw = (1.0 - n / d) * 0.5
                clipmask = ((s_raw > 0.0) & (s_raw < 1.0)).astype(jnp.float32)
                P = gk * clipmask * (-0.425 / C)
                Qn = P / d
                Qd = -P * n / (d * d)
                A = (2.0 / 9.0) * (Qn * mu_y * (n2 - n1) + Qd * mu_x * (d2 - d1))
                A2 = (2.0 / 9.0) * (Qn * mu_x * (n2 - n1) + Qd * mu_y * (d2 - d1))
                Bm = (2.0 / 9.0) * Qn * n1
                Gm = (2.0 / 9.0) * Qd * d1
                bA = boxT(A)
                bA2 = boxT(A2)
                bB = boxT(Bm)
                bG = boxT(Gm)
                xs_pad = x[2 : S + 2, 0 : W + 2]
                ys_pad = y[2 : S + 2, 0 : W + 2]
                dx = bA + ys_pad * bB + xs_pad * bG
                dyc = bA2 + xs_pad * bB + ys_pad * bG
                # local robust-L1 at window centers: coef rows m∈[1, S+1)
                # land on this tile's dpad rows m-1 ∈ [0, S)
                cd = x[2 : S + 2, 1 : W + 1] - y[2 : S + 2, 1 : W + 1]
                l1g = (
                    gk[1 : S + 1, :]
                    * (0.15 / C)
                    * cd
                    * jax.lax.rsqrt(cd * cd + 1e-6)
                )
                l1buf[:] = jnp.zeros((S, WC), jnp.float32)
                l1buf[:, 1 : 1 + W] = l1g
                l1p = l1buf[:, 0 : W + 2]
                dx = dx + l1p
                dyacc[c, :, 0 : W + 2] = dyacc[c, :, 0 : W + 2] + dyc - l1p
                dp_ref[0, k, c, :, 0 : W + 2] = dx
                if WP > W + 2:
                    dp_ref[0, k, c, :, W + 2 : WP] = jnp.zeros(
                        (S, WP - (W + 2)), jnp.float32
                    )

        for k in range(K):
            mk = im == k
            gk = gm * mk.astype(jnp.float32)

            # candidates no pixel in this tile selected contribute nothing:
            # skip the K-way stat recompute for them (automask makes large
            # static regions pick the identity candidates, so real training
            # tiles are usually dominated by 1-2 candidates)
            active = jnp.any(mk & (gm != 0.0))

            @pl.when(jnp.logical_not(active))
            def _(k=k):
                dp_ref[0, k] = jnp.zeros((C, S, WP), jnp.float32)

            @pl.when(active)
            def _(k=k, gk=gk):
                _grad_one_candidate(k, gk)

        dt_ref[0] = dyacc[:]

    dt_pad, dp_pad = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((B, C, total_in_rows, WP), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.HBM),
            pl.BlockSpec(
                (B, K, C, total_in_rows, WP), lambda b, t: (0, 0, 0, 0, 0),
                memory_space=pltpu.HBM,
            ),
            pl.BlockSpec((B, total_g_rows, WG), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.HBM),
            pl.BlockSpec((B, total_g_rows, WG), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, S, WP), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, C, S, WP), lambda b, t: (b, 0, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, R, WP), jnp.float32),
            jax.ShapeDtypeStruct((B, K, C, R, WP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, WIN, WP), jnp.float32),
            pltpu.VMEM((K, C, WIN, WP), jnp.float32),
            pltpu.VMEM((GWIN, WG), jnp.float32),
            pltpu.VMEM((GWIN, WG), jnp.int32),
            pltpu.VMEM((S + 2, WC), jnp.float32),
            pltpu.VMEM((S, WC), jnp.float32),
            pltpu.VMEM((C, S, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(tgt_p, preds_p, g_p, idx_p)

    def fold_reflect(dpad, lead):
        # (lead..., R, WP) -> fold pad=1 reflect -> (lead..., H, W)
        d = dpad.reshape((-1, R, WP))[:, :Hp, : W + 2]
        core = d[:, 1 : H + 1, :]
        core = core.at[:, 1, :].add(d[:, 0, :])
        core = core.at[:, H - 2, :].add(d[:, H + 1, :])
        ccols = core[:, :, 1 : W + 1]
        ccols = ccols.at[:, :, 1].add(core[:, :, 0])
        ccols = ccols.at[:, :, W - 2].add(core[:, :, W + 1])
        return ccols.reshape(lead + (H, W))

    dt = fold_reflect(dt_pad, (B, C)).transpose(0, 2, 3, 1)
    dp = fold_reflect(dp_pad, (B, K, C)).transpose(0, 1, 3, 4, 2)
    return dt.astype(target.dtype), dp.astype(preds.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_min_reprojection(
    target: jnp.ndarray,
    preds: jnp.ndarray,
    row_tile: int = 16,
    interpret: bool = False,
):
    """min_k reprojection_loss(preds[:, k], target).

    Args:
      target: (B, H, W, C); preds: (B, K, H, W, C).
    Returns:
      (min_loss (B, H, W), argmin (B, H, W) int32).
    """
    return _forward_overlap(target, preds, row_tile, interpret)


def _fwd(target, preds, row_tile, interpret):
    out, idx = _forward_overlap(target, preds, row_tile, interpret)
    return (out, idx), (target, preds, idx)


def _bwd(row_tile, interpret, res, cts):
    target, preds, idx = res
    g, _ = cts  # (B, H, W); argmin is non-differentiable
    return _backward_overlap(target, preds, g, idx, interpret)


def _bwd_autodiff(target, preds, idx, g):
    """The r1 recompute-VJP backward (XLA autodiff through K per-candidate
    loss chains), kept for correctness cross-checks and benchmarking."""
    K = preds.shape[1]

    def selected_loss(target, preds):
        total = 0.0
        for k in range(K):
            lk = reprojection_loss(preds[:, k], target)[..., 0]  # (B,H,W)
            total = total + jnp.sum(lk * (idx == k) * g)
        return total

    return jax.grad(selected_loss, argnums=(0, 1))(target, preds)


fused_min_reprojection.defvjp(_fwd, _bwd)
