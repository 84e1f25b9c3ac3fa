"""End-to-end vertical slice: DNN trains, checkpoints, resumes, infers.

Mirrors the reference's integration strategy (test/test_train.py) but
hermetic: synthetic VoiceBank-DEMAND fixture, 1-2 epochs on CPU.
"""

import json
import os

import numpy as np
import pytest

from speech_enhancement_tpu.config import Config, with_defaults
from speech_enhancement_tpu.data.synthetic import make_voicebank_demand
from speech_enhancement_tpu.main import main


@pytest.fixture(scope="module")
def vbd_root(tmp_path_factory):
    return make_voicebank_demand(
        str(tmp_path_factory.mktemp("vbd")), n_utterances=8, min_seconds=1.1, max_seconds=1.6
    )


def _config(vbd_root, run_root, **model_overrides):
    model = {
        "name": "dnn", "audio_channels": 1, "num_spk": 1, "segment": 1,
        "sample_rate": 16000, "n_fft": 256, "hop_length": 128, "win_length": 256,
        "center": True, "n_layers": 2, "hidden_layer": 64, "bias": True,
        "activation": "leaky-relu", "drop_out": 0.1, "dnn_method": "mask",
        "dnn_ema": True,
    }
    model.update(model_overrides)
    return with_defaults(Config({
        "seed": 7,
        "optim": {"optim": "adam", "lr": 1e-3, "loss": "mse", "clip_grad": 5},
        "model": model,
        "dset": {
            "name": "VoiceBankDEMAND", "wav": vbd_root, "split": [0.6, 0.2, 0.2],
            "segment": 1, "audio_channels": 1, "sample_rate": 16000, "norm": "z-score",
        },
        "solver": {
            "root": run_root, "epochs": 2, "batch_size": 4, "all_steps": False,
            "total_steps": 3, "save_checkpoint_interval": 1, "patience": 40,
            "validation": {"total_steps": 2, "interval": 1, "metric": "loss"},
            "test": {"total_steps": 2, "interval": 1, "num_show": 1, "metric": "sisdr"},
        },
    }))


def test_train_checkpoints_and_loss_decreases(vbd_root, tmp_path):
    cfg = _config(vbd_root, str(tmp_path))
    solver = main(cfg, mode="train", return_solver=True)
    assert len(solver.scores["train_loss"]) == 2
    ckpt_dir = solver.checkpoint_dir
    files = os.listdir(ckpt_dir)
    assert "latest_model.ckpt" in files
    assert "best_model.ckpt" in files
    assert "state.json" in files
    assert any(f.startswith("model_") for f in files)
    state = json.load(open(os.path.join(ckpt_dir, "state.json")))
    assert state["best_score"] is not None


def test_resume_restores_weights(vbd_root, tmp_path):
    cfg = _config(vbd_root, str(tmp_path / "a"))
    solver = main(cfg, mode="train", return_solver=True)
    leaf0 = np.asarray(
        next(iter(jax_leaves(solver.state["params"])))
    )

    cfg2 = _config(vbd_root, str(tmp_path / "b"))
    cfg2.solver.resume = solver.run_dir
    cfg2.solver.epochs = 0
    solver2 = main(cfg2, mode="validation", return_solver=True)
    leaf1 = np.asarray(next(iter(jax_leaves(solver2.state["params"]))))
    np.testing.assert_allclose(leaf0, leaf1)


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_inference_scores_enhanced_vs_mixture(vbd_root, tmp_path):
    cfg = _config(vbd_root, str(tmp_path))
    solver = main(cfg, mode="train", return_solver=True)
    summary = solver.inference(save=True)
    assert "enhanced" in summary and "mixture" in summary
    assert np.isfinite(summary["enhanced"]["sisdr"])
    assert os.path.exists(os.path.join(solver.run_dir, "results.csv"))
    wavs = os.listdir(os.path.join(solver.run_dir, "enhanced"))
    assert len(wavs) >= 1


def test_pit_discard_compat_flag(vbd_root, tmp_path):
    # flag exists and training still runs (reference bug replication path)
    cfg = _config(vbd_root, str(tmp_path))
    cfg.optim.pit = True
    cfg.optim.pit_discard_compat = True
    solver = main(cfg, mode="train", return_solver=True)
    assert solver.scores["train_loss"]


def test_examples_inference_script(vbd_root, tmp_path, monkeypatch):
    # guard examples/inference.py against bitrot: run it on a trained run dir
    import subprocess
    import sys

    cfg = _config(vbd_root, str(tmp_path))
    solver = main(cfg, mode="train", return_solver=True)
    wav_dir = os.path.join(vbd_root, "noisy_trainset_wav")
    wav = os.path.join(wav_dir, sorted(os.listdir(wav_dir))[0])
    clean = os.path.join(vbd_root, "clean_trainset_wav", os.path.basename(wav))
    out = str(tmp_path / "enh.wav")
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "examples", "inference.py")
    env = dict(os.environ, SE_TPU_PLATFORM="cpu")
    result = subprocess.run(
        [sys.executable, script, "--run-dir", solver.run_dir, "--wav", wav,
         "--out", out, "--clean", clean],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert os.path.exists(out)
    assert "scores vs clean" in result.stdout
