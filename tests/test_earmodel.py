"""Golden tests for the native HASPI v1 / HASQI v2 implementation.

The external ``clarity`` package (the reference's scoring backend,
src/solver.py:82-89) is absent in this image, so conformance is pinned by
behavioral anchors from the papers rather than third-party equality:
identical-signal scores ~1, monotone degradation with noise, audiogram
sensitivity, and the Clarity better-ear call shape used by ha/scoring.py.
"""

import numpy as np
import pytest

from speech_enhancement_tpu.ha.earmodel import (
    AUD_FREQ,
    center_frequencies,
    cepstral_correlation,
    ear_model,
    haspi_v1,
    haspi_v1_better_ear,
    hasqi_v2,
    hasqi_v2_better_ear,
    loss_parameters,
)

FS = 16000
HL_MILD = np.array([20.0, 20.0, 25.0, 30.0, 40.0, 45.0])
HL_SEVERE = np.array([70.0, 75.0, 80.0, 85.0, 90.0, 90.0])


def _speechish(seconds=1.0, fs=FS):
    t = np.arange(int(seconds * fs)) / fs
    sig = sum(
        np.sin(2 * np.pi * f * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t + p))
        for f, p in [(300, 0.0), (800, 1.0), (1700, 2.0), (3200, 3.0)]
    )
    return sig / np.abs(sig).max() * 0.3


def _degrade(clean, snr_db, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt((clean ** 2).mean() / (noise ** 2).mean())
    return clean + noise * 10.0 ** (-snr_db / 20.0)


# ---------------------------------------------------------------------------
# front-end pieces
# ---------------------------------------------------------------------------

def test_center_frequencies_span_and_order():
    cf = center_frequencies()
    assert cf.shape == (32,)
    assert np.all(np.diff(cf) > 0)
    assert cf[0] == pytest.approx(80.0, rel=1e-6)
    assert cf[-1] == pytest.approx(8000.0, rel=1e-6)


def test_loss_parameters_normal_hearing_is_transparent():
    attn_ohc, attn_ihc, ratio, bw, knee = loss_parameters(
        np.zeros_like(AUD_FREQ), center_frequencies())
    assert np.allclose(attn_ohc, 0.0)
    assert np.allclose(attn_ihc, 0.0)
    assert np.allclose(bw, 1.0)
    assert np.allclose(knee, 30.0)
    assert ratio[0] == pytest.approx(1.25)
    assert ratio[-1] == pytest.approx(3.5)


def test_loss_parameters_split_adds_up_for_mild_loss():
    # below the theoretical OHC ceiling, the 80/20 split must reconstruct
    # the interpolated loss exactly
    attn_ohc, attn_ihc, _, _, _ = loss_parameters(HL_MILD, center_frequencies())
    hl_band = np.interp(np.log10(center_frequencies()), np.log10(AUD_FREQ), HL_MILD)
    mask = attn_ohc < 0.8 * 1.25 * 70 * (1 - 1 / 3.5)  # clearly under ceiling
    assert np.allclose((attn_ohc + attn_ihc)[mask], hl_band[mask], atol=1e-9)


def test_ear_model_shapes_and_finiteness():
    clean = _speechish(0.5)
    ref_db, ref_bm, proc_db, proc_bm, cf, fsm = ear_model(
        clean, _degrade(clean, 10.0), FS, HL_MILD, equalisation=0)
    assert ref_db.shape == proc_db.shape == ref_bm.shape == proc_bm.shape
    assert ref_db.shape[0] == 32
    assert fsm == 24000
    for arr in (ref_db, ref_bm, proc_db, proc_bm):
        assert np.all(np.isfinite(arr))
    assert np.all(ref_db >= 0.0)  # dB SL is floored at 0


def test_cepstral_correlation_identity_and_silence_gate():
    rng = np.random.default_rng(1)
    seg = 10.0 + 5.0 * rng.random((32, 40))
    c, n = cepstral_correlation(seg, seg)
    assert c == pytest.approx(1.0, abs=1e-9)
    assert n == 40
    c0, n0 = cepstral_correlation(np.zeros((32, 40)), np.zeros((32, 40)))
    assert (c0, n0) == (0.0, 0)


# ---------------------------------------------------------------------------
# index-level anchors
# ---------------------------------------------------------------------------

def test_identical_signal_anchors():
    clean = _speechish()
    assert haspi_v1(clean, clean, FS, HL_MILD) > 0.99
    assert hasqi_v2(clean, clean, FS, HL_MILD) > 0.95


def test_monotone_in_snr():
    clean = _speechish()
    haspi = [haspi_v1(clean, _degrade(clean, snr), FS, HL_MILD)
             for snr in (20.0, 0.0, -10.0)]
    hasqi = [hasqi_v2(clean, _degrade(clean, snr), FS, HL_MILD)
             for snr in (20.0, 10.0, 0.0)]
    assert haspi[0] > haspi[1] > haspi[2]
    assert hasqi[0] > hasqi[1] > hasqi[2]
    assert haspi[2] < 0.1  # -10 dB SNR is unintelligible
    assert 0.0 <= min(hasqi) and max(hasqi) <= 1.0


def test_audiogram_sensitivity():
    # the same noisy signal must score lower for a severe loss than for a
    # mild one: audibility gates both indices
    clean = _speechish()
    noisy = _degrade(clean, 10.0)
    assert (haspi_v1(clean, noisy, FS, HL_SEVERE)
            < haspi_v1(clean, noisy, FS, HL_MILD))


def test_better_ear_takes_max():
    clean = _speechish()
    noisy = _degrade(clean, 0.0)
    cfs = np.array([250, 500, 1000, 2000, 3000, 4000, 6000, 8000.0])
    mild8 = np.interp(np.log10(cfs), np.log10(AUD_FREQ), HL_MILD)
    severe8 = np.interp(np.log10(cfs), np.log10(AUD_FREQ), HL_SEVERE)
    both = haspi_v1_better_ear(clean, clean, noisy, noisy, FS,
                               mild8, severe8, cfs)
    left = haspi_v1(clean, noisy, FS, HL_MILD)
    assert both == pytest.approx(left, abs=5e-3)  # mild ear wins
    q = hasqi_v2_better_ear(clean, clean, noisy, noisy, FS,
                            mild8, severe8, cfs)
    assert 0.0 <= q <= 1.0


def test_scorer_emits_native_values(tmp_path):
    # end-to-end through ClarityScorer: without the clarity package the
    # native fallback must fill haspi/hasqi with finite floats
    from speech_enhancement_tpu.data.synthetic import make_ha_config
    from speech_enhancement_tpu.ha.scoring import ClarityScorer

    make_ha_config(str(tmp_path), scenes=["S00001"], n_listeners=1, fs=16000)
    scorer = ClarityScorer(str(tmp_path / "ha.yaml"), input_sr=16000)
    clean = _speechish(0.8)[None, :]
    noisy = _degrade(clean[0], 5.0)[None, :]
    scores = scorer.score(clean, noisy, clean * 0.9 + noisy * 0.1,
                          "S00001_mix")
    for key in ("haspi_enhance", "hasqi_enhance",
                "haspi_mixture", "hasqi_mixture"):
        assert scores[key] is not None and np.isfinite(scores[key])
    assert scores["haspi_enhance"] >= scores["haspi_mixture"] - 0.05
