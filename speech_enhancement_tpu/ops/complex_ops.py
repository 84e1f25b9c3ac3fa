"""Complex-valued building blocks as paired real channels (TPU-first).

TPUs have no native complex conv; like the reference we carry (real, imag)
as separate real tensors and combine with the Gauss-style
(rr - ii, ri + ir) rule. Unlike the reference — which keeps three separate
implementations (src/model/dccrn.py:316-450, src/model/dcunet.py:309-369) —
there is exactly one here, in channels-last NHWC layout so XLA tiles the
convs onto the MXU directly.

All modules take and return a pair ``(real, imag)`` of [B, H, W, C] arrays
(H = frequency, W = time for the spectrogram models).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

ComplexPair = Tuple[jnp.ndarray, jnp.ndarray]


class ComplexConv2d(nn.Module):
    """Complex 2-D convolution: two real convs cross-combined.

    Reference: src/model/dccrn.py:316-384 / src/model/dcunet.py:309-355.
    ``padding`` follows flax conventions (string or per-dim (lo, hi) pairs),
    letting callers express the reference's causal time padding explicitly.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: ComplexPair) -> ComplexPair:
        xr, xi = x
        conv_r = nn.Conv(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=self.use_bias, name="conv_r",
        )
        conv_i = nn.Conv(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=self.use_bias, name="conv_i",
        )
        return conv_r(xr) - conv_i(xi), conv_r(xi) + conv_i(xr)


class ComplexConvTranspose2d(nn.Module):
    """Complex transposed 2-D convolution (reference: dccrn.py:387-450)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: object = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: ComplexPair) -> ComplexPair:
        xr, xi = x
        conv_r = nn.ConvTranspose(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=self.use_bias, name="conv_r",
        )
        conv_i = nn.ConvTranspose(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=self.use_bias, name="conv_i",
        )
        return conv_r(xr) - conv_i(xi), conv_r(xi) + conv_i(xr)


class ComplexDense(nn.Module):
    """Complex linear layer over the last axis."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: ComplexPair) -> ComplexPair:
        xr, xi = x
        dense_r = nn.Dense(self.features, use_bias=self.use_bias, name="dense_r")
        dense_i = nn.Dense(self.features, use_bias=self.use_bias, name="dense_i")
        return dense_r(xr) - dense_i(xi), dense_r(xi) + dense_i(xr)


class ComplexBatchNorm(nn.Module):
    """Complex batch norm with full 2x2 covariance whitening.

    The "deep complex networks" formulation the reference implements at
    src/model/dccrn.py:457-634: per channel, subtract the complex mean, whiten
    by the inverse matrix square root of the (Vrr, Vri; Vri, Vii) covariance,
    then apply a 2x2 affine (gamma_rr/ri/ii, beta_r/i). Running statistics
    live in the ``batch_stats`` collection.
    Whitening math is accumulated in float32 regardless of input dtype.
    """

    momentum: float = 0.9
    eps: float = 1e-5
    use_running_average: bool = False
    # fold=True: single-pass f32 moment reductions over the raw (possibly
    # bf16) activations + whitening/affine collapsed into per-channel 2x2
    # coefficients applied in the INPUT dtype. Halves HBM traffic vs the
    # f32-centered formulation when activations are bf16: no f32 centered
    # intermediates exist, and the apply is one fused multiply-add pass.
    fold: bool = False
    # which axis carries channels (-1 for NHWC activations, 1 for NCHW)
    channel_axis: int = -1

    def _bshape(self, ndim: int) -> tuple:
        """Broadcast shape for per-channel vectors at ``channel_axis``."""
        axis = self.channel_axis % ndim
        return tuple(-1 if d == axis else 1 for d in range(ndim))

    @nn.compact
    def __call__(self, x: ComplexPair, use_running_average: bool | None = None) -> ComplexPair:
        xr, xi = x
        use_ra = (
            self.use_running_average if use_running_average is None else use_running_average
        )
        axis = self.channel_axis % xr.ndim
        channels = xr.shape[axis]
        reduce_axes = tuple(d for d in range(xr.ndim) if d != axis)
        if self.fold:
            return self._folded(xr, xi, use_ra, channels, reduce_axes)

        gamma_rr = self.param("gamma_rr", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ii = self.param("gamma_ii", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ri = self.param("gamma_ri", nn.initializers.zeros, (channels,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (channels,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (channels,))

        ra_mean_r = self.variable("batch_stats", "mean_r", jnp.zeros, (channels,))
        ra_mean_i = self.variable("batch_stats", "mean_i", jnp.zeros, (channels,))
        ra_vrr = self.variable("batch_stats", "vrr", lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        ra_vii = self.variable("batch_stats", "vii", lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        ra_vri = self.variable("batch_stats", "vri", jnp.zeros, (channels,))

        # NOTE: a "folded" variant (whitening+affine collapsed to per-channel
        # multiply-adds applied directly to x) measured ~3% slower on v5e
        # than this f32-centered formulation — XLA fuses this chain better.
        fr = xr.astype(jnp.float32)
        fi = xi.astype(jnp.float32)
        bshape = self._bshape(xr.ndim)  # per-channel broadcast at channel_axis

        if use_ra:
            mean_r, mean_i = ra_mean_r.value, ra_mean_i.value
            vrr, vii, vri = ra_vrr.value, ra_vii.value, ra_vri.value
            cr = fr - mean_r.reshape(bshape)
            ci = fi - mean_i.reshape(bshape)
        else:
            mean_r = jnp.mean(fr, axis=reduce_axes)
            mean_i = jnp.mean(fi, axis=reduce_axes)
            cr = fr - mean_r.reshape(bshape)
            ci = fi - mean_i.reshape(bshape)
            vrr = jnp.mean(cr * cr, axis=reduce_axes)
            vii = jnp.mean(ci * ci, axis=reduce_axes)
            vri = jnp.mean(cr * ci, axis=reduce_axes)
            # tiny per-channel vectors: tagging them lets a named-saves remat
            # policy (DCCRN remat_policy) skip re-running the big stat
            # reductions in the backward recompute
            mean_r = checkpoint_name(mean_r, "cbn_stats")
            mean_i = checkpoint_name(mean_i, "cbn_stats")
            vrr = checkpoint_name(vrr, "cbn_stats")
            vii = checkpoint_name(vii, "cbn_stats")
            vri = checkpoint_name(vri, "cbn_stats")
            cr = fr - mean_r.reshape(bshape)
            ci = fi - mean_i.reshape(bshape)
            if not self.is_initializing():
                m = self.momentum
                ra_mean_r.value = m * ra_mean_r.value + (1 - m) * mean_r
                ra_mean_i.value = m * ra_mean_i.value + (1 - m) * mean_i
                ra_vrr.value = m * ra_vrr.value + (1 - m) * vrr
                ra_vii.value = m * ra_vii.value + (1 - m) * vii
                ra_vri.value = m * ra_vri.value + (1 - m) * vri

        vrr = vrr + self.eps
        vii = vii + self.eps
        # Inverse square root of the 2x2 covariance (per channel).
        det = vrr * vii - vri * vri
        s = jnp.sqrt(jnp.maximum(det, 1e-12))
        t = jnp.sqrt(vrr + vii + 2.0 * s)
        inv_st = 1.0 / (s * t)
        wrr = (vii + s) * inv_st
        wii = (vrr + s) * inv_st
        wri = -vri * inv_st

        yr = wrr.reshape(bshape) * cr + wri.reshape(bshape) * ci
        yi = wri.reshape(bshape) * cr + wii.reshape(bshape) * ci
        zr = (gamma_rr.reshape(bshape) * yr + gamma_ri.reshape(bshape) * yi
              + beta_r.reshape(bshape))
        zi = (gamma_ri.reshape(bshape) * yr + gamma_ii.reshape(bshape) * yi
              + beta_i.reshape(bshape))
        return zr.astype(xr.dtype), zi.astype(xi.dtype)

    def _folded(self, xr, xi, use_ra, channels, reduce_axes):
        """Folded-coefficient path: same math, different evaluation order.

        Stats are one-pass f32 moments (E[x], E[x^2], E[xr*xi]) reduced
        directly from the raw activations; whitening + the 2x2 affine fold
        into per-channel coefficients (a few channel-length vectors of f32
        scalar math); the tensor-sized work is a single fused multiply-add
        in the input dtype. Bitwise this differs from the centered
        formulation only by f32 rounding in the (tiny) coefficient math.
        """
        gamma_rr = self.param("gamma_rr", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ii = self.param("gamma_ii", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ri = self.param("gamma_ri", nn.initializers.zeros, (channels,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (channels,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (channels,))

        ra_mean_r = self.variable("batch_stats", "mean_r", jnp.zeros, (channels,))
        ra_mean_i = self.variable("batch_stats", "mean_i", jnp.zeros, (channels,))
        ra_vrr = self.variable("batch_stats", "vrr", lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        ra_vii = self.variable("batch_stats", "vii", lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        ra_vri = self.variable("batch_stats", "vri", jnp.zeros, (channels,))

        if use_ra:
            mean_r, mean_i = ra_mean_r.value, ra_mean_i.value
            vrr, vii, vri = ra_vrr.value, ra_vii.value, ra_vri.value
        else:
            fr = xr.astype(jnp.float32)
            fi = xi.astype(jnp.float32)
            mean_r = jnp.mean(fr, axis=reduce_axes)
            mean_i = jnp.mean(fi, axis=reduce_axes)
            e_rr = jnp.mean(fr * fr, axis=reduce_axes)
            e_ii = jnp.mean(fi * fi, axis=reduce_axes)
            e_ri = jnp.mean(fr * fi, axis=reduce_axes)
            vrr = jnp.maximum(e_rr - mean_r * mean_r, 0.0)
            vii = jnp.maximum(e_ii - mean_i * mean_i, 0.0)
            vri = e_ri - mean_r * mean_i
            mean_r = checkpoint_name(mean_r, "cbn_stats")
            mean_i = checkpoint_name(mean_i, "cbn_stats")
            vrr = checkpoint_name(vrr, "cbn_stats")
            vii = checkpoint_name(vii, "cbn_stats")
            vri = checkpoint_name(vri, "cbn_stats")
            if not self.is_initializing():
                m = self.momentum
                ra_mean_r.value = m * ra_mean_r.value + (1 - m) * mean_r
                ra_mean_i.value = m * ra_mean_i.value + (1 - m) * mean_i
                ra_vrr.value = m * ra_vrr.value + (1 - m) * vrr
                ra_vii.value = m * ra_vii.value + (1 - m) * vii
                ra_vri.value = m * ra_vri.value + (1 - m) * vri

        vrr = vrr + self.eps
        vii = vii + self.eps
        det = vrr * vii - vri * vri
        s = jnp.sqrt(jnp.maximum(det, 1e-12))
        t = jnp.sqrt(vrr + vii + 2.0 * s)
        inv_st = 1.0 / (s * t)
        wrr = (vii + s) * inv_st
        wii = (vrr + s) * inv_st
        wri = -vri * inv_st

        # fold affine @ whitening into one per-channel 2x2 (+ offset)
        arr = gamma_rr * wrr + gamma_ri * wri
        ari = gamma_rr * wri + gamma_ri * wii
        air = gamma_ri * wrr + gamma_ii * wri
        aii = gamma_ri * wri + gamma_ii * wii
        cr0 = beta_r - (arr * mean_r + ari * mean_i)
        ci0 = beta_i - (air * mean_r + aii * mean_i)

        dt = xr.dtype
        bshape = self._bshape(xr.ndim)
        zr = (arr.astype(dt).reshape(bshape) * xr
              + ari.astype(dt).reshape(bshape) * xi
              + cr0.astype(dt).reshape(bshape))
        zi = (air.astype(dt).reshape(bshape) * xr
              + aii.astype(dt).reshape(bshape) * xi
              + ci0.astype(dt).reshape(bshape))
        return zr, zi


class ComplexBatchNormStacked(nn.Module):
    """ComplexBatchNorm over a channel-stacked [..., 2C] array ([r..., i...]).

    Same math as :class:`ComplexBatchNorm` (full 2x2 covariance whitening,
    dccrn.py:457-634) but evaluated as ONE elementwise stream over the
    stacked tensor: the (r, i) cross terms come from a lane rotation
    (``jnp.roll`` by C on the channel axis), halving the number of HBM
    passes vs the paired formulation. Measured on TPU v5e this LOSES to the
    paired version inside DCCRN (183 ms vs 118 ms per train step): the lane
    rotations are cross-lane shuffles that break XLA's elementwise fusion.
    Kept as a tested alternative / documented negative result; DCCRN uses
    :class:`ComplexBatchNorm`. Statistics accumulate in float32.
    """

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, y2: jnp.ndarray, use_running_average: bool = False) -> jnp.ndarray:
        channels = y2.shape[-1] // 2
        reduce_axes = tuple(range(y2.ndim - 1))

        gamma_rr = self.param("gamma_rr", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ii = self.param("gamma_ii", lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (channels,))
        gamma_ri = self.param("gamma_ri", nn.initializers.zeros, (channels,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (channels,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (channels,))

        ra_mean = self.variable("batch_stats", "mean2", jnp.zeros, (2 * channels,))
        ra_var = self.variable(
            "batch_stats", "var2", lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (2 * channels,)
        )
        ra_vri = self.variable("batch_stats", "vri", jnp.zeros, (channels,))

        f = y2.astype(jnp.float32)
        if use_running_average:
            mean2, var2, vri = ra_mean.value, ra_var.value, ra_vri.value
            centered = f - mean2
            rolled = jnp.roll(centered, channels, axis=-1)
        else:
            mean2 = jnp.mean(f, axis=reduce_axes)
            centered = f - mean2
            rolled = jnp.roll(centered, channels, axis=-1)
            var2 = jnp.mean(centered * centered, axis=reduce_axes)
            vri = jnp.mean(centered * rolled, axis=reduce_axes)[:channels]
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean2
                ra_var.value = m * ra_var.value + (1 - m) * var2
                ra_vri.value = m * ra_vri.value + (1 - m) * vri

        vrr = var2[:channels] + self.eps
        vii = var2[channels:] + self.eps
        det = vrr * vii - vri * vri
        s = jnp.sqrt(jnp.maximum(det, 1e-12))
        t = jnp.sqrt(vrr + vii + 2.0 * s)
        inv_st = 1.0 / (s * t)
        wrr = (vii + s) * inv_st
        wii = (vrr + s) * inv_st
        wri = -vri * inv_st

        w_diag = jnp.concatenate([wrr, wii])
        w_cross = jnp.concatenate([wri, wri])
        whitened = centered * w_diag + rolled * w_cross
        g_diag = jnp.concatenate([gamma_rr, gamma_ii])
        g_cross = jnp.concatenate([gamma_ri, gamma_ri])
        beta2 = jnp.concatenate([beta_r, beta_i])
        out = whitened * g_diag + jnp.roll(whitened, channels, axis=-1) * g_cross + beta2
        return out.astype(y2.dtype)


class ComplexBatchNormSimple(nn.Module):
    """Independent real BatchNorms on each part (reference: dcunet.py:358-369)."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: ComplexPair, use_running_average: bool = False) -> ComplexPair:
        xr, xi = x
        bn_r = nn.BatchNorm(
            use_running_average=use_running_average, momentum=self.momentum,
            epsilon=self.eps, name="bn_r",
        )
        bn_i = nn.BatchNorm(
            use_running_average=use_running_average, momentum=self.momentum,
            epsilon=self.eps, name="bn_i",
        )
        return bn_r(xr), bn_i(xi)


def complex_prelu(x: ComplexPair, alpha_r: jnp.ndarray, alpha_i: jnp.ndarray) -> ComplexPair:
    """PReLU applied independently per part (the reference's choice)."""
    xr, xi = x
    return (
        jnp.where(xr >= 0, xr, alpha_r * xr),
        jnp.where(xi >= 0, xi, alpha_i * xi),
    )
