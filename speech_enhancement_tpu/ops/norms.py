"""Normalization layers + EMA smoothers (TPU-first, channels-last).

Reference counterparts:
* ``GlobalLayerNorm`` / ``ChannelwiseLayerNorm`` — conv-tasnet's gLN/cLN
  (src/model/conv_tasnet.py:439-487) and sepformer's copies
  (src/model/sepformer.py:851-983);
* ``CumulativeLayerNorm`` — causal cLN with running statistics over time;
* ``EMA`` — the reference's ExponentialMovingAverage runs a Python loop per
  timestep (src/model/ema.py:24-40, a documented hot spot); here the same
  first-order recurrence is a log-depth ``lax.associative_scan``;
* ``PCEN`` — trainable (s)PCEN front-end (src/model/sepformer/
  normalization.py:487-627).

All modules here operate channels-last: [B, T, C] (or [B, ..., C]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (time..., channel) per sample; per-channel affine."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (channels,))
        beta = self.param("beta", nn.initializers.zeros, (channels,))
        axes = tuple(range(1, x.ndim))
        # statistics in f32 (bf16-safe), output in input dtype
        mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(x * x, axis=axes, keepdims=True, dtype=jnp.float32) - mean**2
        scale = (gamma / jnp.sqrt(jnp.maximum(var, 0.0) + self.eps)).astype(x.dtype)
        shift = (beta - gamma * mean / jnp.sqrt(jnp.maximum(var, 0.0) + self.eps)).astype(x.dtype)
        return x * scale + shift


class ChannelwiseLayerNorm(nn.Module):
    """cLN: normalize over the channel axis at each time step; affine."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (channels,))
        beta = self.param("beta", nn.initializers.zeros, (channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True, dtype=jnp.float32) - mean**2
        inv = 1.0 / jnp.sqrt(jnp.maximum(var, 0.0) + self.eps)
        out = (x.astype(jnp.float32) - mean) * inv * gamma + beta
        return out.astype(x.dtype)


class CumulativeLayerNorm(nn.Module):
    """Causal cLN: at step t, normalize by stats of all frames <= t.

    Input [B, T, C]. Statistics pool over (past time x channels), computed
    with two cumulative sums — O(T) work, no serial scan.
    """

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (channels,))
        beta = self.param("beta", nn.initializers.zeros, (channels,))
        step_sum = jnp.sum(x, axis=-1)  # [B, T]
        step_sq = jnp.sum(x**2, axis=-1)
        cum_sum = jnp.cumsum(step_sum, axis=1)[..., None]  # [B, T, 1]
        cum_sq = jnp.cumsum(step_sq, axis=1)[..., None]
        count = (jnp.arange(1, x.shape[1] + 1) * channels)[None, :, None].astype(x.dtype)
        mean = cum_sum / count
        var = cum_sq / count - mean**2
        return gamma * (x - mean) / jnp.sqrt(jnp.maximum(var, 0.0) + self.eps) + beta


def ema_scan(x: jnp.ndarray, alpha, axis: int = 1) -> jnp.ndarray:
    """First-order EMA along ``axis``: y_t = (1-a) * y_{t-1} + a * x_t, y_-1 = 0.

    Matches the reference recurrence (src/model/ema.py:29-38: first output is
    ``alpha * x_0``) but as a log-depth associative scan instead of a Python
    per-timestep loop. ``alpha`` may be a scalar or per-channel array
    (broadcast against x with time on ``axis``).
    """
    x = jnp.moveaxis(x, axis, 0)
    a = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), x.shape[1:])
    coeff = jnp.broadcast_to(1.0 - a, x.shape)
    val = x * a

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (coeff, val), axis=0)
    return jnp.moveaxis(y, 0, axis)


class EMA(nn.Module):
    """EMA smoother over [B, T, C]; fixed or learnable coefficient.

    ``trainable=True`` gives a per-channel learnable smoother (the learnable
    ExponentialMovingAverage of src/model/sepformer/normalization.py:487-515),
    with the coefficient kept in (0, 1) through a sigmoid.
    """

    alpha: float = 0.1
    trainable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.trainable:
            logit0 = float(jnp.log(self.alpha / (1.0 - self.alpha)))
            logit = self.param(
                "alpha_logit",
                lambda key, shape: jnp.full(shape, logit0),
                (x.shape[-1],),
            )
            alpha = jax.nn.sigmoid(logit)
        else:
            alpha = self.alpha
        return ema_scan(x, alpha, axis=1)


class PCEN(nn.Module):
    """Per-channel energy normalization over [B, T, C] magnitudes.

    pcen = (x / (eps + EMA(x))**alpha + delta)**r - delta**r, with trainable
    alpha/delta/r (and trainable per-channel smoother when ``spcen=True``),
    reference: src/model/sepformer/normalization.py:517-627.
    """

    alpha: float = 0.96
    delta: float = 2.0
    root: float = 2.0
    smooth_coef: float = 0.04
    floor: float = 1e-6
    spcen: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        channels = x.shape[-1]
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.alpha), (channels,))
        delta = self.param("delta", lambda k, s: jnp.full(s, self.delta), (channels,))
        root = self.param("root", lambda k, s: jnp.full(s, self.root), (channels,))
        smoother = EMA(alpha=self.smooth_coef, trainable=self.spcen, name="smoother")(x)
        one_over_root = 1.0 / jnp.maximum(root, 1e-3)
        smooth = jnp.exp(-alpha * jnp.log(self.floor + smoother))
        return (x * smooth + delta) ** one_over_root - delta**one_over_root
