"""MelRNN magnitude-mask model (reference: src/model/mel_rnn.py, 1.4 MB).

Mono STFT masker: amplitude -> optional mel projection (power 0.3
compression first) -> RNN/LSTM/GRU (no bias) -> BatchNorm -> two FC layers
(ReLU, Sigmoid) -> optional inverse-mel -> mask multiply on (real, imag).

Quirk preserved for parity: the reference's ``Amplitude`` computes
``|re^2 - im^2|``, not the true magnitude (mel_rnn.py:121-123, SURVEY
§6b.2).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import STFT_MONO, SignalSpec
from speech_enhancement_tpu.ops.mel import inverse_mel_filterbank, mel_filterbank
from speech_enhancement_tpu.ops.rnn import RNNStack


def amplitude_quirk(x: jnp.ndarray) -> jnp.ndarray:
    """|re^2 - im^2| (reference Amplitude, mel_rnn.py:121-123)."""
    return jnp.abs(x[..., 0] ** 2 - x[..., 1] ** 2)


class MelRNN(nn.Module):
    SPEC: SignalSpec = STFT_MONO

    n_fft: int = 512
    hop_length: int = 256
    n_mels: int = 0
    f_min: float = 100.0
    f_max: float = 8000.0
    sample_rate: int = 16000
    rnn_hidden: int = 256
    rnn_layer: int = 2
    rnn_type: str = "rnn"
    # reference-shipped bug replication (mel_rnn.py:40-61 + forward:99-101):
    # torch builds the RNN with batch_first=False but feeds [B, T, F], so
    # the recurrence runs across the BATCH dim with T as the batch. Default
    # False = proper time recurrence; True reproduces the reference
    # execution exactly (torch-weight parity, tests/test_parity.py).
    rnn_over_batch_compat: bool = False
    # resident-weight Pallas recurrence (ops/pallas/lstm.py; lstm type only)
    fused_rnn: object = False

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # inputs: [B, 1, F, T, 2] (mono)
        n_freqs = self.n_fft // 2 + 1
        x = amplitude_quirk(inputs)
        x = x[:, 0]  # merge (mono) channel -> [B, F, T]

        if self.n_mels:
            fb = jnp.asarray(
                mel_filterbank(n_freqs, self.n_mels, self.sample_rate, self.f_min, self.f_max)
            )
            x = jnp.power(x, 0.3)
            x = jnp.einsum("bft,fm->bmt", x, fb)

        x = jnp.swapaxes(x, -1, -2)  # [B, T, features]
        if self.rnn_over_batch_compat:
            # emulate torch batch_first=False fed with [B, T, F]: the cell
            # scans over dim 0 (batch) treating T as the batch
            x = jnp.swapaxes(x, 0, 1)
        x = RNNStack(
            rnn_type=self.rnn_type, hidden_size=self.rnn_hidden,
            num_layers=self.rnn_layer, use_bias=False, name="rnn",
            fused=self.fused_rnn,
        )(x, train=train)
        if self.rnn_over_batch_compat:
            x = jnp.swapaxes(x, 0, 1)
        # BatchNorm over features (torch BatchNorm1d on [B, C, T] normalizes C)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        x = nn.relu(nn.Dense(self.n_mels or n_freqs, name="fc1")(x))
        x = nn.sigmoid(nn.Dense(self.n_mels or n_freqs, name="fc2")(x))
        x = jnp.swapaxes(x, -1, -2)  # [B, features, T]

        if self.n_mels:
            inv = jnp.asarray(
                inverse_mel_filterbank(
                    n_freqs, self.n_mels, self.sample_rate, self.f_min, self.f_max
                )
            )
            x = jnp.maximum(jnp.einsum("bmt,mf->bft", x, inv), 0.0)

        mask = x[:, None, :, :, None]  # [B, 1, F, T, 1]
        return inputs * mask
