"""Frozen regression goldens for the native P.862 implementation.

The reference scores PESQ through the ITU `pesq` wheel (reference
src/metric.py:147-175); this repo's fallback is the from-spec C++ model
(native/pesq.cpp). The behavioral anchor tests (tests/test_metrics.py)
check invariances — identical-signal ceiling, monotonicity, level
invariance — but cannot catch a silent scoring *drift* across refactors.
These goldens pin ten deterministic degradation pairs to frozen MOS-LQO
values: any change to the perceptual model that moves a score by more than
the tolerance fails loudly and must re-freeze the table deliberately.

The pairs also cover the bad-interval re-split stage (P.862 §10.2.4,
landed round 5): the `dropouts` pair's zeroed spans produce pathological
frames the re-split re-aligns and re-scores (with-resplit 2.72 vs
without 2.47), and the min-rule is asserted as a property: disabling the
stage (PESQ_NATIVE_NO_RESPLIT=1) can never RAISE a score.
"""

import os

import numpy as np
import pytest

from speech_enhancement_tpu.data.synthetic import _speech_like
from speech_enhancement_tpu.train import pesq_native

pytestmark = pytest.mark.skipif(
    not pesq_native.available(), reason="native PESQ library not built"
)

SR = 16000

# frozen 2026-08-20 (round 5, native/pesq.cpp with bad-interval re-split);
# tolerance covers compiler/libm jitter, not model changes
GOLDENS = {
    #                       wb      nb
    "identity":           (4.6439, 4.5486),
    "noise_snr20":        (2.6215, 2.1779),
    "noise_snr5":         (1.4969, 1.3846),
    "lowpass9":           (4.6438, 4.5486),
    "clip_030":           (2.0370, 1.6619),
    "gain_half":          (4.6439, 4.5486),
    "delay_80":           (4.6439, 4.5486),
    "piecewise_delay_600": (4.0454, 3.9755),
    "mulaw":              (2.1567, 1.7513),
    "dropouts":           (2.7214, 2.6554),
}
TOL = 0.02


def _pairs():
    rng = np.random.default_rng(2026)
    clean = _speech_like(rng, 4 * SR, SR).astype(np.float32)
    noise = rng.standard_normal(4 * SR).astype(np.float32)

    def with_snr(x, nz, snr_db):
        g = np.sqrt(np.mean(x ** 2)
                    / (np.mean(nz ** 2) * 10 ** (snr_db / 10)))
        return (x + g * nz).astype(np.float32)

    def delayed(x, d):
        return np.concatenate([np.zeros(d, np.float32), x[:-d]])

    def piecewise_delay(x, d):
        out = x.copy()
        h = len(x) // 2
        out[h:] = delayed(x, d)[h:]
        return out

    def dropouts(x, n=6, ms=100):
        out = x.copy()
        step = len(x) // (n + 1)
        w = SR * ms // 1000
        for i in range(1, n + 1):
            out[i * step:i * step + w] = 0.0
        return out

    def mulaw(x, mu=63.0):
        peak = np.max(np.abs(x)) + 1e-9
        y = np.sign(x / peak) * np.log1p(mu * np.abs(x / peak)) / np.log1p(mu)
        return (y * peak).astype(np.float32)

    peak = np.max(np.abs(clean))
    return clean, {
        "identity": clean,
        "noise_snr20": with_snr(clean, noise, 20.0),
        "noise_snr5": with_snr(clean, noise, 5.0),
        "lowpass9": np.convolve(clean, np.ones(9, np.float32) / 9,
                                mode="same").astype(np.float32),
        "clip_030": np.clip(clean, -0.3 * peak, 0.3 * peak),
        "gain_half": (0.5 * clean).astype(np.float32),
        "delay_80": delayed(clean, 80),
        "piecewise_delay_600": piecewise_delay(clean, 600),
        "mulaw": mulaw(clean),
        "dropouts": dropouts(clean),
    }


@pytest.fixture(scope="module")
def pairs():
    return _pairs()


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(pairs, name):
    clean, degs = pairs
    wb_gold, nb_gold = GOLDENS[name]
    wb = pesq_native.pesq_native(SR, clean, degs[name], "wb")
    nb = pesq_native.pesq_native(SR, clean, degs[name], "nb")
    assert wb == pytest.approx(wb_gold, abs=TOL), f"{name} wb drifted"
    assert nb == pytest.approx(nb_gold, abs=TOL), f"{name} nb drifted"


def test_resplit_never_hurts(pairs):
    """The Rec's min-rule: per-frame minimum of original vs re-aligned
    disturbance means disabling the re-split can never raise a score."""
    clean, degs = pairs
    for name, deg in degs.items():
        with_ = pesq_native.pesq_native(SR, clean, deg, "wb")
        os.environ["PESQ_NATIVE_NO_RESPLIT"] = "1"
        try:
            without = pesq_native.pesq_native(SR, clean, deg, "wb")
        finally:
            del os.environ["PESQ_NATIVE_NO_RESPLIT"]
        assert with_ >= without - 1e-9, name


def test_resplit_engages_on_dropouts(pairs):
    """Pins that the stage is live, not dead code: the dropout pair's
    pathological frames must be re-scored upward by > 0.1 MOS."""
    clean, degs = pairs
    with_ = pesq_native.pesq_native(SR, clean, degs["dropouts"], "wb")
    os.environ["PESQ_NATIVE_NO_RESPLIT"] = "1"
    try:
        without = pesq_native.pesq_native(SR, clean, degs["dropouts"], "wb")
    finally:
        del os.environ["PESQ_NATIVE_NO_RESPLIT"]
    assert with_ - without > 0.1
