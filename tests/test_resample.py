"""Resampler tests (julius-equivalent polyphase sinc, ops/resample.py)."""

import jax.numpy as jnp
import numpy as np
from scipy.signal import resample_poly

from speech_enhancement_tpu.ops.resample import downsample2, resample_frac, upsample2


def _tone(freq, sr, n):
    return np.sin(2 * np.pi * freq * np.arange(n) / sr).astype(np.float32)


def test_output_length_convention():
    x = jnp.zeros((2, 48000))
    assert resample_frac(x, 48000, 16000).shape == (2, 16000)
    assert resample_frac(x, 16000, 16000).shape == (2, 48000)
    assert resample_frac(jnp.zeros((1, 1001)), 2, 1).shape == (1, 501)


def test_tone_preserved_downsample():
    sr_in, sr_out = 48000, 16000
    x = _tone(440, sr_in, 48000)
    y = np.asarray(resample_frac(jnp.asarray(x)[None], sr_in, sr_out))[0]
    ref = resample_poly(x.astype(np.float64), sr_out, sr_in)
    # compare in the interior (edges differ by window choice)
    sl = slice(500, 15500)
    err = np.abs(y[sl] - ref[sl]).max()
    assert err < 5e-3
    # spectrum peak still at 440 Hz
    spec = np.abs(np.fft.rfft(y[sl]))
    peak = np.argmax(spec) * sr_out / len(y[sl])
    assert abs(peak - 440) < 5


def test_up_down_round_trip():
    x = _tone(1000, 16000, 16000) * 0.7
    up = upsample2(jnp.asarray(x)[None])
    assert up.shape == (1, 32000)
    back = np.asarray(downsample2(up))[0]
    sl = slice(1000, 15000)
    assert np.abs(back[sl] - x[sl]).max() < 1e-3


def test_aliasing_rejected():
    # 7 kHz tone sampled at 48k downsampled to 8k (nyquist 4k) must vanish
    x = _tone(7000, 48000, 48000)
    y = np.asarray(resample_frac(jnp.asarray(x)[None], 48000, 8000))[0]
    assert np.abs(y[200:-200]).max() < 0.02
