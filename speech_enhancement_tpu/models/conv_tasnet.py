"""Conv-TasNet time-domain separator (reference: src/model/conv_tasnet.py;
Luo & Mesgarani 2019).

Encoder (Conv1d k=L stride=L/2 + ReLU) -> TemporalConvNet mask head
(cLN/gLN, bottleneck 1x1, R repeats x X dilated depthwise-separable blocks
with residual and optional skip path, mask ReLU/softmax) -> linear basis
decoder with overlap-and-add.

TPU-first notes: internal layout is NWC [B, K, C]; the decoder's
overlap-and-add uses the scatter-free chunked OLA (ops/frame.py) instead of
the reference's ``index_add_`` gather loop (conv_tasnet.py:11-31); the
depthwise convs use ``feature_group_count`` so XLA lowers them to fused
channelwise ops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import WAV_MULTI, SignalSpec
from speech_enhancement_tpu.ops.frame import overlap_add
from speech_enhancement_tpu.ops.norms import ChannelwiseLayerNorm, GlobalLayerNorm


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


def _norm(norm_type: str, name: str):
    if norm_type == "gLN":
        return GlobalLayerNorm(name=name)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(name=name)
    raise ValueError(f"unsupported norm {norm_type!r}")


class _DepthwiseSeparable(nn.Module):
    hidden: int
    bottleneck: int
    kernel: int
    dilation: int
    norm_type: str
    causal: bool
    skip: bool
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        pad = (self.kernel - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        y = nn.Conv(
            self.hidden, (self.kernel,), padding=padding,
            kernel_dilation=(self.dilation,), feature_group_count=self.hidden,
            use_bias=False, dtype=self.dtype, name="depthwise",
        )(x)
        y = _PReLU(name="prelu")(y)
        y = _norm(self.norm_type, "norm")(y)
        out = nn.Conv(self.bottleneck, (1,), use_bias=False, dtype=self.dtype,
                      name="pointwise")(y)
        if self.skip:
            skip = nn.Conv(self.bottleneck, (1,), use_bias=False, dtype=self.dtype,
                           name="skip_conv")(y)
            return out, skip
        return out, None


class _TemporalBlock(nn.Module):
    hidden: int
    bottleneck: int
    kernel: int
    dilation: int
    norm_type: str
    causal: bool
    skip: bool
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        y = nn.Conv(self.hidden, (1,), use_bias=False, dtype=self.dtype,
                    name="conv1x1")(x)
        y = _PReLU(name="prelu")(y)
        y = _norm(self.norm_type, "norm")(y)
        out, skip = _DepthwiseSeparable(
            self.hidden, self.bottleneck, self.kernel, self.dilation,
            self.norm_type, self.causal, self.skip, dtype=self.dtype, name="dsconv",
        )(y)
        return x + out, skip


class ConvTasNet(nn.Module):
    SPEC: SignalSpec = WAV_MULTI

    sources: Tuple = (None, None)
    N: int = 128
    L: int = 40
    B: int = 128
    H: int = 256
    P: int = 3
    X: int = 7
    R: int = 2
    audio_channels: int = 2
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"
    skip: bool = False
    # compute dtype for convs ("bfloat16" = TPU fast path); params stay f32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, mixture: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mixture: [B, C, T] -> est sources [B, S, C, T]
        n_spk = len(self.sources)
        t_origin = mixture.shape[-1]

        compute_dtype = jnp.dtype(self.dtype)
        # ---- encoder (conv_tasnet.py:157-176): [B, K, N]
        x = jnp.swapaxes(mixture, 1, 2).astype(compute_dtype)  # NWC
        mixture_w = nn.relu(
            nn.Conv(self.N, (self.L,), strides=(self.L // 2,), padding="VALID",
                    use_bias=False, dtype=compute_dtype, name="encoder")(x)
        )

        # ---- separator (conv_tasnet.py:209-304)
        y = ChannelwiseLayerNorm(name="layer_norm")(mixture_w)
        y = nn.Conv(self.B, (1,), use_bias=False, dtype=compute_dtype,
                    name="bottleneck")(y)
        skip_sum: Optional[jnp.ndarray] = None
        for r in range(self.R):
            for xi in range(self.X):
                y, skip = _TemporalBlock(
                    self.H, self.B, self.P, 2**xi, self.norm_type, self.causal,
                    self.skip, dtype=compute_dtype, name=f"block_{r}_{xi}",
                )(y)
                if self.skip and skip is not None:
                    skip_sum = skip if skip_sum is None else skip_sum + skip
        head_in = skip_sum if self.skip else y
        mask = nn.Conv(n_spk * self.N, (1,), use_bias=False, dtype=compute_dtype,
                       name="mask_conv")(head_in)
        k_frames = mask.shape[1]
        mask = mask.reshape(mask.shape[0], k_frames, n_spk, self.N)
        if self.mask_nonlinear == "softmax":
            mask = jax.nn.softmax(mask, axis=2)
        elif self.mask_nonlinear == "relu":
            mask = nn.relu(mask)
        else:
            raise ValueError(f"unsupported mask nonlinearity {self.mask_nonlinear!r}")

        # ---- decoder (conv_tasnet.py:179-204): linear basis + overlap-add
        source_w = mixture_w[:, :, None, :] * mask  # [B, K, S, N]
        frames = nn.Dense(self.audio_channels * self.L, use_bias=False,
                          dtype=compute_dtype, name="decoder")(source_w)
        frames = frames.astype(jnp.float32)  # [B, K, S, ac*L]; OLA in f32
        batch = frames.shape[0]
        frames = frames.reshape(batch, k_frames, n_spk, self.audio_channels, self.L)
        frames = frames.transpose(0, 2, 3, 1, 4)  # [B, S, ac, K, L]
        est = overlap_add(frames, self.L // 2)  # [B, S, ac, T_conv]
        pad = t_origin - est.shape[-1]
        if pad > 0:
            est = jnp.pad(est, ((0, 0),) * (est.ndim - 1) + ((0, pad),))
        return est[..., :t_origin]
