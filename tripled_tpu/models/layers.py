"""Shared NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the reference's `mono/model/mono_fm_joint/layers.py`
block zoo: reflection-padded convs, ELU conv blocks, CRP (chained residual
pooling), channel/pixel attention variants, squeeze-excitation fusion, and
the disentangle channel-split helpers.

Conventions:
- NHWC everywhere (TPU-native layout; XLA keeps convs on the MXU).
- conv init matches the reference module-for-module: kaiming-normal
  (fan_out) ONLY where the reference re-inits (ResNets, pose encoders,
  ChannelAttention — `kaiming_out`); torch Conv2d DEFAULTS everywhere else
  (`torch_conv_kernel`/`torch_conv_bias` — see the note at their
  definition; the blanket kaiming_out used through round 4 saturated the
  CRP decoder's sigmoid disp head at init).
- BatchNorm: momentum 0.9 / eps 1e-5 (torch defaults); cross-replica sync is
  implicit under jit+sharding (global-batch reduction), matching the
  reference's SyncBN (`mono/apis/trainer.py:156-157`).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

# torch Conv2d DEFAULT init: kernel kaiming_uniform_(a=sqrt(5)) == U(+-1/
# sqrt(fan_in)), bias U(+-1/sqrt(fan_in)). The reference re-inits ONLY its
# ResNets / pose encoders / ChannelAttention with kaiming fan_out
# (`mono/model/mono_fm/resnet.py:104`); every decoder/head conv keeps the
# torch default. Round 5 found that blanket-kaiming_out decoder convs
# saturate the CRP decoder's sigmoid disp head at init (the summing CRP
# chain amplifies the 6x-larger per-layer variance until |logits| > 18,
# where f32 tanh-based sigmoid is EXACTLY 0/1 with zero gradient): a
# from-scratch model was born with a dead depth head. torch-default init
# reproduces the reference's healthy init statistics.
torch_conv_kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")


class BatchNorm(nn.Module):
    """torch-default BatchNorm2d (momentum 0.1 ⇒ flax momentum 0.9)."""

    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura, momentum=0.9, epsilon=1e-5, dtype=x.dtype
        )(x)


class Conv1x1(nn.Module):
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels,
            (1, 1),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel,
            bias_init=torch_conv_bias(x.shape[-1]),
        )(x)


class Conv3x3(nn.Module):
    """Reflection-padded 3×3 conv (`layers.py:171-183`)."""

    out_channels: int
    use_refl: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_refl:
            x = reflect_pad(x, 1)
            padding = "VALID"
        else:
            padding = [(1, 1), (1, 1)]
        return nn.Conv(
            self.out_channels,
            (3, 3),
            padding=padding,
            kernel_init=torch_conv_kernel,
            bias_init=torch_conv_bias(9 * x.shape[-1]),
        )(x)


class Conv5x5(nn.Module):
    out_channels: int
    use_refl: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_refl:
            x = reflect_pad(x, 2)
            padding = "VALID"
        else:
            padding = [(2, 2), (2, 2)]
        return nn.Conv(
            self.out_channels,
            (5, 5),
            padding=padding,
            kernel_init=torch_conv_kernel,
            bias_init=torch_conv_bias(25 * x.shape[-1]),
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (`layers.py:150-158`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.out_channels)(x))


def max_pool_5x5_same(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


@jax.custom_vjp
def max_pool_5x5_same_eqmask(x: jnp.ndarray) -> jnp.ndarray:
    """`max_pool_5x5_same` with an equality-mask backward instead of XLA's
    select-and-scatter (13.7 ms/step of the round-4 profile, the CRP pools).

    Backward: position p receives g[q] / ties[q] from every output q in its
    5×5 neighborhood whose max equals x[p], where ties[q] is the number of
    window positions tied at the max — two 25-shift elementwise passes that
    fuse on the VPU. On tie-free windows ties[q] == 1 (division by 1.0 is
    exact), so each window routes exactly the gradient select-and-scatter
    routes; bitwise equality of the per-position SUM over overlapping
    windows additionally relies on matching XLA's float accumulation order,
    which `tests/test_eqmask_pool.py` verifies holds on this backend but is
    an implementation detail, not a guarantee (ADVICE r4).
    Deviation: a tied window AVERAGES its cotangent over
    the tied positions (a valid, mass-conserving subgradient) where SAS (and
    torch, `/root/reference/mono/model/mono_fm/layers.py:200-215`'s
    F.max_pool2d) concentrates it on one arbitrary element. Ties are NOT
    rare inside CRP: stages 2-4 pool conv1x1 of a stride-1 maxpool, whose
    outputs carry plateaus of genuinely equal values (~10% of windows
    measured on random input) — a naive all-ties routing inflates plateau
    gradients up to 25x, which is why the tie count divides.
    Opt-in via `ModelConfig.pool_eqmask_grad` (default False = bit-exact
    SAS path).
    """
    return max_pool_5x5_same(x)


def _mp5_eq_fwd(x):
    return max_pool_5x5_same(x), x


def _shift25(a, H, W):
    """The 25 (di, dj) translates of a (B, H+4, W+4, C)-padded array."""
    for di in range(5):
        for dj in range(5):
            yield jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(a, di, di + H, axis=1),
                dj,
                dj + W,
                axis=2,
            )


def _mp5_eq_bwd(x, g):
    y = max_pool_5x5_same(x)  # recomputed: cheaper than saving it in HBM
    H, W = x.shape[1], x.shape[2]
    pad = ((0, 0), (2, 2), (2, 2), (0, 0))
    # -inf pad on x: padding never counts as (or beats) a window max
    xp = jnp.pad(x, pad, constant_values=-jnp.inf)
    # ties[q] = number of window positions equal to the max (>= 1)
    ties = sum(
        (xs == y).astype(g.dtype) for xs in _shift25(xp, H, W)
    )
    gq = g / ties  # exact when ties == 1 (the tie-free case)
    gp = jnp.pad(gq, pad)
    # +inf pad on y: out-of-bounds outputs can never match a real x value
    yp = jnp.pad(y, pad, constant_values=jnp.inf)
    acc = jnp.zeros_like(x)
    for ys, gs in zip(_shift25(yp, H, W), _shift25(gp, H, W)):
        acc = acc + jnp.where(ys == x, gs, 0)
    return (acc.astype(x.dtype),)


max_pool_5x5_same_eqmask.defvjp(_mp5_eq_fwd, _mp5_eq_bwd)


class CRPBlock(nn.Module):
    """Chained residual pooling: n_stages × (5×5 maxpool → 1×1 conv), summed
    into the input (`layers.py:200-215`)."""

    out_channels: int
    n_stages: int = 4
    eqmask_pool: bool = False

    @nn.compact
    def __call__(self, x):
        pool = (
            max_pool_5x5_same_eqmask if self.eqmask_pool else max_pool_5x5_same
        )
        top = x
        for _ in range(self.n_stages):
            top = pool(top)
            top = Conv1x1(self.out_channels, use_bias=False)(top)
            x = top + x
        return x


class SqueezeAndExcitationBlock(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=True)(x)
        y = nn.relu(y)
        return nn.Conv(self.channels, (1, 1), use_bias=True)(y)


class ChannelDescriptor(nn.Module):
    """Per-channel (std, mean) spatial descriptors (`layers.py:284-294`)."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        return jnp.sqrt(var), mean


class AdaptivelyScaledCALayer(nn.Module):
    """ASCA attention for disentangle skip layers (`layers.py:297-331`)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        std_des, mean_des = ChannelDescriptor()(x)
        ref_std = SqueezeAndExcitationBlock(self.channels, self.reduction)(std_des)
        ref_mean = SqueezeAndExcitationBlock(self.channels, self.reduction)(mean_des)
        fused = jnp.concatenate([ref_std, ref_mean], axis=-1)
        fused = nn.relu(nn.Conv(self.channels, (1, 1), use_bias=True)(fused))
        fused = SqueezeAndExcitationBlock(self.channels, self.reduction)(fused)
        return x * nn.sigmoid(fused)


class CALayer(nn.Module):
    """Channel (or pixel) attention (`layers.py:341-383`).

    pix_att=True skips pooling (pixel attention); contrast_aware uses the
    rescaled-contrast descriptor instead of the mean.
    """

    channels: int
    reduction: int = 16
    contrast_aware: bool = False
    pix_att: bool = False

    @nn.compact
    def __call__(self, x):
        if self.contrast_aware:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
            std = jnp.sqrt(var)
            y = -mean / std + std
        elif not self.pix_att:
            y = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            y = x
        y = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=True)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 1), use_bias=True)(y)
        return x * nn.sigmoid(y)


def identity_partial(x: jnp.ndarray, part_ratio: int = 2, use_right: bool = False):
    """Channel-slice half of an embedding (`layers.py:386-400`)."""
    c = x.shape[-1]
    if use_right:
        return x[..., c // part_ratio :]
    return x[..., : c // part_ratio]


class FSEModule(nn.Module):
    """HR-Depth feature squeeze-excitation fusion (`layers.py:247-281`)."""

    out_channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, high: jnp.ndarray, lows: Sequence[jnp.ndarray]):
        from tripled_tpu.ops.image import upsample2x_nearest

        feats = jnp.concatenate([upsample2x_nearest(high)] + list(lows), axis=-1)
        c = feats.shape[-1]
        y = jnp.mean(feats, axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False)(y)
        y = nn.sigmoid(y)[:, None, None, :]
        feats = feats * y
        return nn.relu(nn.Conv(self.out_channels, (1, 1), use_bias=True)(feats))


class ChannelAttention(nn.Module):
    """DIFFNet channel attention (`layers.py:459-479`)."""

    channels: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channels // self.ratio, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False)(y)
        return nn.sigmoid(y)[:, None, None, :] * x


class AttentionModule(nn.Module):
    """DIFFNet decoder attention fusion (`layers.py:433-456`)."""

    out_channels: int

    @nn.compact
    def __call__(self, high: jnp.ndarray, lows: Sequence[jnp.ndarray]):
        from tripled_tpu.ops.image import upsample2x_nearest

        feats = jnp.concatenate([upsample2x_nearest(high)] + list(lows), axis=-1)
        feats = ChannelAttention(feats.shape[-1])(feats)
        feats = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True
        )(feats)
        return nn.relu(feats)


class SPM(nn.Module):
    """CADepth structure-perception module (`layers.py:403-429`): channel-wise
    self-attention via a C×C gram matrix — a single large MXU matmul."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        v = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", v, v)  # (B, C, C)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, v)
        return out.reshape(b, h, w, c) + x


class UpShuffle(nn.Module):
    """Reflection-padded 3×3 conv → PixelShuffle(r) → ELU (`layers.py:124-134`).

    Sub-pixel init (repeating one kaiming kernel r² times) reproduces the
    reference's `init_subpixel` so the shuffle starts as a smooth upsample.
    """

    channels: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x):
        r = self.upscale
        c = self.channels

        def subpixel_init(key, shape, dtype=jnp.float32):
            # the reference's init_subpixel draws the sub-kernel with
            # torch kaiming_normal_ DEFAULTS (fan_in mode), then repeats
            # it r^2 times (`mono_fm_joint/layers.py:114-122`)
            kh, kw, cin, cout = shape
            kaiming_in = nn.initializers.variance_scaling(
                2.0, "fan_in", "normal"
            )
            sub = kaiming_in(key, (kh, kw, cin, cout // (r * r)), dtype)
            return jnp.repeat(sub, r * r, axis=-1)

        x = reflect_pad(x, 1)
        x = nn.Conv(
            c * r * r,
            (3, 3),
            padding="VALID",
            kernel_init=subpixel_init,
            bias_init=torch_conv_bias(9 * x.shape[-1]),
        )(x)
        b, h, w, _ = x.shape
        # NHWC pixel shuffle: (B,H,W,C*r*r) -> (B,H*r,W*r,C). torch's
        # nn.PixelShuffle reads the channel axis as (C, r, r) — out channel
        # c takes input channel c*r*r + i*r + j — so the last axis must be
        # split (c, i, j), not (i, j, c).
        x = x.reshape(b, h, w, c, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, c)
        return nn.elu(x)


class DeconvBlock(nn.Module):
    """ConvTranspose 3×3 s2 + edge reflection pad + ELU (`layers.py:137-147`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID"
        )(x)
        # torch output_padding=0 with padding=1 trims to 2*in-1; then the
        # reference reflection-pads (0,1,0,1) back to 2*in.
        x = x[:, 1:-1, 1:-1, :]
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)], mode="reflect")
        return nn.elu(x)


class PyramidPooling(nn.Module):
    """PSP pooling block (`layers.py:10-30`)."""

    out_channels: int
    norm: Callable[..., Any] = BatchNorm

    @nn.compact
    def __call__(self, x, train: bool = True):
        from tripled_tpu.ops.image import resize_nearest

        b, h, w, c = x.shape
        outs = [x]
        for bins in (1, 2, 3, 6):
            ph, pw = h // bins, w // bins
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = nn.Conv(self.out_channels, (1, 1), use_bias=False)(pooled)
            pooled = BatchNorm()(pooled, use_running_average=not train)
            pooled = nn.relu(pooled)
            outs.append(resize_nearest(pooled, h, w))
        return jnp.concatenate(outs, axis=-1)
