"""Eval-pipeline tests (reference: test/test_eval.py — identity round trips).

The reference verifies that ``evaluate()`` with ``model=None`` reproduces
the input through segment -> (stft -> istft) -> overlap-discard stitching
for both a WAV-model config and an STFT-model config.
"""

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.config import Config, with_defaults
from speech_enhancement_tpu.models.types import STFT_MONO, WAV_MONO
from speech_enhancement_tpu.train.evaluate import (
    evaluate_utterance,
    extract_windows,
    stitch_overlap_discard,
)
from speech_enhancement_tpu.utils import get_filtered_snr_file


def _cfg(norm="z-score"):
    return with_defaults(Config({
        "model": {"name": "dnn", "segment": 1, "sample_rate": 16000,
                  "n_fft": 256, "hop_length": 128, "win_length": 256},
        "dset": {"sample_rate": 16000, "norm": norm},
    }))


def _speech(rng, n):
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


def test_identity_wav_model(rng):
    # model=None passthrough (reference evaluate.py:65-66) must reproduce input
    x = _speech(rng, 45000)[None, None]  # [1, 1, T], not a window multiple
    cfg = _cfg()
    out = np.asarray(evaluate_utterance(jnp.asarray(x), None, None, WAV_MONO, cfg))
    assert out.shape == x.shape
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_identity_stft_model(rng):
    x = _speech(rng, 40000)[None, None]
    cfg = _cfg()
    out = np.asarray(evaluate_utterance(jnp.asarray(x), None, None, STFT_MONO, cfg))
    assert out.shape == x.shape
    # interior must round-trip through stft/istft within reference tolerance
    np.testing.assert_allclose(out[..., 256:-256], x[..., 256:-256], atol=1e-3)


def test_identity_linear_scale_norm(rng):
    x = _speech(rng, 33000)[None, None]
    cfg = _cfg(norm="linear-scale")
    out = np.asarray(evaluate_utterance(jnp.asarray(x), None, None, WAV_MONO, cfg))
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_extract_and_stitch_contract(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 5000)).astype(np.float32))
    windows = extract_windows(x, 1600, 400, 12)
    assert windows.shape == (12, 1, 2, 1600)
    # first window must be the raw signal head
    np.testing.assert_array_equal(np.asarray(windows[0]), np.asarray(x[..., :1600]))
    stitched = stitch_overlap_discard(windows, 400, 5000)
    assert stitched.shape == (1, 2, 5000)
    # overlap-discard: identical windows of the same signal reproduce it
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(x), atol=1e-6)


def test_short_utterance_single_window(rng):
    x = _speech(rng, 12000)[None, None]  # shorter than the 16000 window
    cfg = _cfg()
    out = np.asarray(evaluate_utterance(jnp.asarray(x), None, None, WAV_MONO, cfg))
    assert out.shape == x.shape
    np.testing.assert_allclose(out, x, atol=1e-4)


def test_snr_filter_vbd(tmp_path):
    log_dir = tmp_path / "logfiles"
    log_dir.mkdir()
    (log_dir / "log_trainset_28spk.txt").write_text(
        "p226_001 bus 2\np226_002 cafe 7\np226_003 street 0\n"
    )
    names = get_filtered_snr_file("VoiceBankDEMAND", str(log_dir))
    assert names == ["p226_001", "p226_003"]


def test_snr_filter_clarity(tmp_path):
    import json

    path = tmp_path / "scenes.train.snr.json"
    path.write_text(json.dumps({"S1": 3.2, "S2": 6.0, "S3": -1.0}))
    assert get_filtered_snr_file("Clarity", str(path)) == ["S1"]
