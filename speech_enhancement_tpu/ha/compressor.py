"""Dynamic-range compressor (reference: src/ha/compressor.py, Clarity MSBG).

Per-sample pipeline: sliding-RMS over a 0.2 s rectangular window, then an
attack/release-smoothed compression ratio multiplied into the signal.

The reference computes the smoother with a *Python loop per sample per
(batch, speaker)* on the host (compressor.py:73-109) — O(B*S*T) interpreter
steps. The recurrence

    c_t = a_t * c_{t-1} + b_t,
    (a_t, b_t) = (1 - attack,  attack * g(rms_t))   if rms_t > threshold
                 (1 - release, release)             otherwise

has coefficients depending only on rms_t, so it is a first-order linear
recurrence -> evaluated here as a log-depth ``lax.associative_scan`` on
device, batched over (batch, speaker) at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


class Compressor:
    def __init__(
        self,
        fs: int = 44100,
        attack: float = 5.0,
        release: float = 20.0,
        threshold: float = 1.0,
        attenuation: float = 0.0001,
        rms_buffer_size: float = 0.2,
        makeup_gain: float = 1.0,
    ):
        self.fs = fs
        self.attack = (1000.0 / attack) / fs  # reciprocal ms -> per-sample coeff
        self.release = (1000.0 / release) / fs
        self.threshold = threshold
        self.attenuation = attenuation
        self.win_len = int(rms_buffer_size * fs)
        self.makeup_gain = makeup_gain
        self.eps = 1e-8

    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        return _compress(
            signal, self.win_len, self.attack, self.release, self.threshold,
            self.attenuation, self.eps,
        )

    process = __call__  # reference API name (compressor.py:73)


@partial(jax.jit, static_argnames=("win_len",))
def _compress(signal, win_len, attack, release, threshold, attenuation, eps):
    lead = signal.shape[:-1]
    length = signal.shape[-1]
    flat = signal.reshape(-1, 1, length)

    # sliding RMS with (win_len - 1) left zero-pad (compressor.py:85-91)
    window = jnp.ones((1, 1, win_len), signal.dtype) / win_len
    mean_sq = jax.lax.conv_general_dilated(
        flat * flat, window, window_strides=(1,),
        padding=[(win_len - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    rms = jnp.sqrt(mean_sq[:, 0, :] + eps)  # [N, T]

    over = rms > threshold
    temp_comp = rms * attenuation + (1.0 - attenuation) * threshold
    coeff_a = jnp.where(over, 1.0 - attack, 1.0 - release)
    coeff_b = jnp.where(over, temp_comp * attack, release)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    # c_{-1} = 1.0: fold the initial condition into the first element.
    coeff_b = coeff_b.at[:, 0].add(coeff_a[:, 0] * 1.0)
    _, comp = jax.lax.associative_scan(combine, (coeff_a, coeff_b), axis=1)
    out = flat[:, 0, :] * comp
    return out.reshape(*lead, length)
