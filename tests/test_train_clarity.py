"""Clarity end-to-end flows (reference: test/test_train.py — including the
two-phase se -> deverb resume flow, test_train.py:15-34) on synthetic data."""

import numpy as np
import pytest

from speech_enhancement_tpu.config import Config, with_defaults
from speech_enhancement_tpu.data.synthetic import make_clarity
from speech_enhancement_tpu.main import main


@pytest.fixture(scope="module")
def clarity_root(tmp_path_factory):
    return make_clarity(str(tmp_path_factory.mktemp("clarity")), n_scenes=4,
                        seconds=1.2)


def _config(root, run_root, mode="se", model="conv-tasnet"):
    model_cfg = {
        "name": model, "audio_channels": 2, "num_spk": 2, "segment": 1,
        "sample_rate": 16000, "n_fft": 256, "hop_length": 128, "win_length": 256,
        "center": True, "sources": [None, None],
        # tiny conv-tasnet
        "N": 16, "L": 16, "B": 16, "H": 32, "P": 3, "X": 3, "R": 1,
    }
    return with_defaults(Config({
        "seed": 5,
        "optim": {"optim": "adam", "lr": 1e-3, "loss": "si-sdr", "clip_grad": 5,
                  "pit": True},
        "model": model_cfg,
        "dset": {
            "name": "Clarity", "wav": root, "split": [0.5, 0.25, 0.25],
            "segment": 1, "audio_channels": 2, "sample_rate": 16000,
            "norm": "z-score", "mode": mode,
        },
        "solver": {
            "root": run_root, "epochs": 1, "batch_size": 4, "all_steps": False,
            "total_steps": 2, "save_checkpoint_interval": 1,
            "validation": {"total_steps": 1, "interval": 1, "metric": "loss"},
            "test": {"total_steps": 1, "interval": 1, "num_show": 0,
                     "metric": "sisdr"},
        },
    }))


def test_multispeaker_pit_training(clarity_root, tmp_path):
    cfg = _config(clarity_root, str(tmp_path))
    solver = main(cfg, mode="train", return_solver=True)
    assert np.isfinite(solver.scores["train_loss"][0])
    assert solver.use_pit


def test_two_phase_se_then_deverb(clarity_root, tmp_path):
    # phase 1: train on "se" task
    cfg_se = _config(clarity_root, str(tmp_path / "se"), mode="se")
    s1 = main(cfg_se, mode="train", return_solver=True)
    # phase 2: resume those weights for the "deverb" task
    cfg_dv = _config(clarity_root, str(tmp_path / "deverb"), mode="deverb")
    cfg_dv.solver.resume = s1.run_dir
    s2 = main(cfg_dv, mode="train", return_solver=True)
    assert np.isfinite(s2.scores["train_loss"][0])


def test_multispeaker_inference_scores(clarity_root, tmp_path):
    cfg = _config(clarity_root, str(tmp_path))
    solver = main(cfg, mode="train", return_solver=True)
    summary = solver.inference()
    assert np.isfinite(summary["enhanced"]["sisdr"])
    assert np.isfinite(summary["mixture"]["sisdr"])
