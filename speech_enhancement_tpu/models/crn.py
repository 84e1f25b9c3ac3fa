"""CRN — convolutional recurrent masking net (reference: src/model/crn.py, 3 MB).

Encoder of 5 causal conv blocks (k=(3,2), s=(2,1), time-chomped) -> 2-layer
LSTM over flattened channel x freq (1792 wide for n_fft=512) -> mirror
decoder of causal transposed convs with skip concats -> magnitude mask.

Internal layout is NHWC ([B, F, T, C]) so XLA keeps convs on the MXU; the
recurrence is the hoisted-projection scan LSTM.

The reference's amplitude is ``sqrt(re^2 - im^2)`` which goes NaN (its
README flags training as broken, crn.py:101, SURVEY §6b.2). The rebuild
defaults to the correct magnitude; ``amplitude_compat=True`` replicates the
reference formula bit-for-bit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import STFT_MONO, SignalSpec
from speech_enhancement_tpu.ops.rnn import LSTMLayer

_ENC_CHANNELS = (16, 32, 64, 128, 256)


class _CausalConvBlock(nn.Module):
    features: int
    dtype: object = None  # compute dtype (bf16 fast path); params stay f32
    # "offline": zero-pad left 1 in time (the causal pad). "stream": the
    # caller prepends the cached previous frame instead (serve/streaming.py
    # CRNStreamer), so no internal pad — outputs align with offline frames.
    time_mode: str = "offline"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: [B, F, T, C]; freq VALID k3 s2, time causal k2 s1 (pad left 1)
        t_pad = (1, 0) if self.time_mode == "offline" else (0, 0)
        x = nn.Conv(
            self.features, (3, 2), strides=(2, 1), padding=((0, 0), t_pad),
            dtype=self.dtype, name="conv"
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        return nn.elu(x)


class _CausalTransConvBlock(nn.Module):
    features: int
    is_last: bool = False
    extra_freq_pad: int = 0
    dtype: object = None
    # "offline": VALID transpose then chomp the LAST time step (out[t]
    # depends on in[t-1..t], out[0] sees only in[0] — a zero history).
    # "stream": the caller prepends the cached previous input frame; the
    # T+2 VALID outputs are sliced [1:-1] so chunk outputs equal the
    # offline frames exactly (serve/streaming.py CRNStreamer).
    time_mode: str = "offline"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.features, (3, 2), strides=(2, 1), padding="VALID",
            use_bias=False, dtype=self.dtype, name="conv"
        )(x)
        t_sl = slice(None, -1) if self.time_mode == "offline" else slice(1, -1)
        x = x[:, :, t_sl, :]  # causal chomp / stream alignment
        if self.extra_freq_pad:
            # torch output_padding=(1, 0): the appended high-freq row gets
            # no kernel contributions, only the bias — so the bias is added
            # AFTER the pad (zero-padding then biasing matches torch
            # exactly; see crn_from_torch_state / test_parity.py)
            x = jnp.pad(x, ((0, 0), (0, self.extra_freq_pad), (0, 0), (0, 0)))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x + bias.astype(x.dtype)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        return nn.relu(x) if self.is_last else nn.elu(x)


class CRN(nn.Module):
    SPEC: SignalSpec = STFT_MONO

    use_lstm: bool = True
    amplitude_compat: bool = False
    # compute dtype for convs + the 1792-wide LSTMs ("bfloat16" is the TPU
    # fast path — the model is LSTM-matmul-bound); params/BN stats stay f32
    dtype: str = "float32"
    lstm_unroll: int = 8  # lax.scan unroll (amortizes loop overhead)
    # resident-weight Pallas recurrence (ops/pallas/lstm.py): the 1792-wide
    # w_hh (25.7 MB bf16) stays in VMEM across timesteps instead of being
    # re-streamed from HBM every step
    fused_rnn: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, 1, F, T, 2]
        compute_dtype = jnp.dtype(self.dtype)
        if self.amplitude_compat:
            amplitude = jnp.sqrt(x[..., 0] ** 2 - x[..., 1] ** 2)  # reference NaN quirk
        else:
            amplitude = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-8)
        h = jnp.moveaxis(amplitude, 1, -1)  # [B, F, T, C=1]

        skips = []
        for i, features in enumerate(_ENC_CHANNELS):
            h = _CausalConvBlock(features, dtype=compute_dtype,
                                 name=f"enc_{i + 1}")(h, train)
            skips.append(h)

        if self.use_lstm:
            # torch flattens channel-major: feature index = c * n_freq + f
            # (crn.py:115-124); match that ordering.
            batch, n_freq, n_frame, n_chan = h.shape
            flat = h.transpose(0, 2, 3, 1).reshape(batch, n_frame, n_chan * n_freq)
            flat, _ = LSTMLayer(n_chan * n_freq, dtype=compute_dtype,
                                unroll=self.lstm_unroll, name="lstm1",
                                fused=self.fused_rnn)(flat)
            flat, _ = LSTMLayer(n_chan * n_freq, dtype=compute_dtype,
                                unroll=self.lstm_unroll, name="lstm2",
                                fused=self.fused_rnn)(flat)
            mid = flat.reshape(batch, n_frame, n_chan, n_freq)
            mid = mid.transpose(0, 3, 1, 2)  # [B, F, T, C]
        else:
            mid = h

        d = mid
        dec_channels = (128, 64, 32, 16, 1)
        for i, features in enumerate(dec_channels):
            skip = skips[len(skips) - 1 - i]
            d = jnp.concatenate([d, skip], axis=-1)
            d = _CausalTransConvBlock(
                features,
                is_last=(i == len(dec_channels) - 1),
                extra_freq_pad=1 if i == 3 else 0,
                dtype=compute_dtype,
                name=f"dec_{i + 1}",
            )(d, train)

        mask = jnp.moveaxis(d, -1, 1).astype(jnp.float32)  # [B, 1, F, T]
        return mask[..., None] * x
