"""Mel filterbank tests (ops/mel.py; torchaudio-MelScale-compatible HTK scale)."""

import numpy as np

from speech_enhancement_tpu.ops.mel import (
    _hz_to_mel,
    _mel_to_hz,
    inverse_mel_filterbank,
    mel_filterbank,
)


def test_mel_hz_round_trip():
    freqs = np.array([100.0, 440.0, 1000.0, 8000.0])
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(freqs)), freqs, rtol=1e-10)
    # HTK anchor: 1000 Hz = 1000 mel
    assert abs(_hz_to_mel(1000.0) - 999.9855) < 0.1


def test_filterbank_shape_and_triangles():
    fb = mel_filterbank(257, 40, 16000, f_min=0.0, f_max=8000.0)
    assert fb.shape == (257, 40)
    assert np.all(fb >= 0)
    # each filter is nonzero somewhere and unimodal-ish (single peak)
    for m in range(40):
        col = fb[:, m]
        assert col.max() > 0
        peak = np.argmax(col)
        assert np.all(np.diff(col[: peak + 1]) >= -1e-7)
        assert np.all(np.diff(col[peak:]) <= 1e-7)


def test_inverse_filterbank_approximate_identity():
    fb = mel_filterbank(257, 80, 16000, f_min=0.0, f_max=8000.0)
    inv = inverse_mel_filterbank(257, 80, 16000, f_min=0.0, f_max=8000.0)
    assert inv.shape == (80, 257)
    # smooth spectrum -> mel -> inverse should roughly reconstruct
    freqs = np.linspace(0, 8000, 257)
    spec = np.exp(-((freqs - 2000) ** 2) / (2 * 800**2)).astype(np.float32)
    mel = spec @ fb
    back = mel @ inv
    interior = slice(20, 230)
    corr = np.corrcoef(back[interior], spec[interior])[0, 1]
    assert corr > 0.98
