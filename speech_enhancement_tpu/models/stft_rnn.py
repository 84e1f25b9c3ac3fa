"""RNN STFT-mask multi-speaker separator (reference: src/model/stft_rnn.py).

The multi-speaker STFT masker: amplitude (|re^2 - im^2| quirk preserved,
stft_rnn.py:112-119) -> (bi)RNN stack without bias -> BatchNorm -> Linear to
F * num_spk + ReLU -> per-speaker masks multiplied into the mixture
spectrogram: output [B, S, C, F, T, 2] (stft_rnn.py:98-110).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.mel_rnn import amplitude_quirk
from speech_enhancement_tpu.models.types import STFT_MULTI, SignalSpec
from speech_enhancement_tpu.ops.rnn import RNNStack


class RNNSTFTMask(nn.Module):
    SPEC: SignalSpec = STFT_MULTI

    num_spk: int = 2
    audio_channels: int = 2
    n_fft: int = 512
    hop_length: int = 256
    sample_rate: int = 16000
    rnn_hidden: int = 256
    rnn_layer: int = 2
    rnn_type: str = "rnn"
    drop_out: float = 0.5
    activation: str = "relu"
    bidirectional: bool = False
    # reference-shipped bug replication (stft_rnn.py:39-62 + forward:85-87):
    # torch builds the RNN with batch_first=False but feeds [B*C, T, F], so
    # the recurrence runs across the merged batch*channel dim with T as the
    # batch (same class as MelRNN's quirk). Default False = proper time
    # recurrence; True reproduces the reference execution exactly.
    rnn_over_batch_compat: bool = False
    # compute dtype for the RNN stack ("bfloat16" is the TPU fast path — the
    # model is recurrent-matmul-bound: 3x bidirectional 896-wide LSTMs);
    # params, BatchNorm, Dense head and the mask multiply stay float32.
    dtype: str = "float32"
    rnn_unroll: int = 8  # lax.scan unroll (amortizes loop overhead on TPU)
    # resident-weight Pallas recurrence (ops/pallas/lstm.py): w_hh stays in
    # VMEM across timesteps instead of re-streaming from HBM every step
    # (lstm layers only; True = TPU, "force" = interpret mode for tests)
    fused_rnn: object = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # inputs: [B, C, F, T, 2]
        batch, n_channel, n_feature, n_frame, _ = inputs.shape
        mask = amplitude_quirk(inputs)  # [B, C, F, T]
        mask = mask.reshape(batch * n_channel, n_feature, n_frame)
        mask = jnp.swapaxes(mask, 1, 2)  # [B*C, T, F]
        if self.rnn_over_batch_compat:
            mask = jnp.swapaxes(mask, 0, 1)  # torch batch_first=False quirk
        mask = RNNStack(
            rnn_type=self.rnn_type, hidden_size=self.rnn_hidden,
            num_layers=self.rnn_layer, bidirectional=self.bidirectional,
            dropout=self.drop_out, use_bias=False, name="rnn",
            unroll=self.rnn_unroll, dtype=jnp.dtype(self.dtype),
            fused=self.fused_rnn,
        )(mask, train=train).astype(jnp.float32)
        if self.rnn_over_batch_compat:
            mask = jnp.swapaxes(mask, 0, 1)
        mask = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(mask)
        mask = nn.Dense(n_feature * self.num_spk, name="fc")(mask)
        mask = nn.relu(mask)
        # [B*C, T, F*S] -> [B, S, C, F, T]
        mask = jnp.swapaxes(mask, 1, 2)  # [B*C, F*S, T]
        mask = mask.reshape(batch * n_channel, self.num_spk, n_feature, n_frame)
        mask = mask.reshape(batch, n_channel, self.num_spk, n_feature, n_frame)
        mask = jnp.swapaxes(mask, 1, 2)  # [B, S, C, F, T]
        return mask[..., None] * inputs[:, None]
