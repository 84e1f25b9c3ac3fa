"""Clarity dev-set factory test (reference: distrib.py:185-200)."""

from speech_enhancement_tpu.config import Config
from speech_enhancement_tpu.data.loader import get_dev_wav_clarity
from speech_enhancement_tpu.data.synthetic import make_clarity


def test_get_dev_wav_clarity(tmp_path):
    root = make_clarity(str(tmp_path), n_scenes=3)
    cfg = Config({
        "wav": root, "norm": "z-score", "sample_rate": 16000,
        "audio_channels": 2, "mode": "se",
    })
    ds = get_dev_wav_clarity(cfg)
    assert len(ds) == 3
    item = ds[0]
    assert "original_length" in item  # eval-mode items
