"""Batched test-time evaluation == the batch-1 reference contract.

VERDICT r4 task 4: `--mode test` packs window-count-bucket peers into one
fixed-shape device batch (solver.test.batch_size). These tests pin the
bit-identity claim: per-utterance masked normalization means a row of a
batched call equals the same utterance evaluated alone, and a Solver
inference run with batch_size 4 writes the SAME results.csv and
test_summary.json as batch_size 1 (reference batch-1 loop,
src/solver.py:546)."""

import csv
import json
import os

import numpy as np
import pytest

from speech_enhancement_tpu.config import Config, with_defaults
from speech_enhancement_tpu.data.synthetic import make_voicebank_demand
from speech_enhancement_tpu.main import main
from speech_enhancement_tpu.train.evaluate import evaluate_utterance


@pytest.fixture(scope="module")
def vbd_root(tmp_path_factory):
    return make_voicebank_demand(
        str(tmp_path_factory.mktemp("vbd_be")), n_utterances=10,
        min_seconds=1.1, max_seconds=1.9
    )


def _config(vbd_root, run_root, eval_batch):
    return with_defaults(Config({
        "seed": 7,
        "optim": {"optim": "adam", "lr": 1e-3, "loss": "mse", "clip_grad": 5},
        "model": {
            "name": "dnn", "audio_channels": 1, "num_spk": 1, "segment": 1,
            "sample_rate": 16000, "n_fft": 256, "hop_length": 128,
            "win_length": 256, "center": True, "n_layers": 2,
            "hidden_layer": 64, "bias": True, "activation": "leaky-relu",
            "drop_out": 0.1, "dnn_method": "mask", "dnn_ema": True,
        },
        "dset": {
            "name": "VoiceBankDEMAND", "wav": vbd_root,
            "split": [0.4, 0.1, 0.5], "segment": 1, "audio_channels": 1,
            "sample_rate": 16000, "norm": "z-score",
        },
        "solver": {
            "root": run_root, "epochs": 1, "batch_size": 4,
            "all_steps": False, "total_steps": 2,
            "save_checkpoint_interval": 1, "patience": 40,
            "validation": {"total_steps": 1, "interval": 1, "metric": "loss"},
            "test": {"total_steps": 0, "interval": 1, "num_show": 0,
                     "metric": "sisdr", "batch_size": eval_batch},
        },
    }))


def test_batched_rows_equal_single(rng=np.random.default_rng(3)):
    """Identity model: mixed-length rows of one batched call match the same
    utterances evaluated one by one, exactly."""
    cfg = _config("/nonexistent", "/tmp", 1)  # only model/dset sections used

    from speech_enhancement_tpu.models.types import SignalSpec

    spec = SignalSpec(domain="wav", monarch=True, multi_speaker=False)
    lengths = [17000, 19500, 23321]
    t_max = max(lengths)
    utts = [rng.standard_normal((1, n)).astype(np.float32) for n in lengths]
    mix = np.zeros((len(utts), 1, t_max), np.float32)
    for b, u in enumerate(utts):
        mix[b, :, :lengths[b]] = u

    batched = evaluate_utterance(mix, None, None, spec, cfg,
                                 lengths=np.asarray(lengths))
    for b, u in enumerate(utts):
        single = evaluate_utterance(u[None], None, None, spec, cfg)
        np.testing.assert_array_equal(batched[b:b + 1, ..., :lengths[b]],
                                      single)


def test_solver_inference_batched_identical(vbd_root, tmp_path):
    """Full --mode test flow: batch_size 4 vs 1 produce identical
    results.csv rows (same order) and identical test_summary.json."""
    cfg1 = _config(vbd_root, str(tmp_path / "b1"), 1)
    solver = main(cfg1, mode="train", return_solver=True)
    s1 = solver.inference()

    cfg4 = _config(vbd_root, str(tmp_path / "b4"), 4)
    cfg4.solver.resume = solver.run_dir
    cfg4.solver.epochs = 0
    solver4 = main(cfg4, mode=None, return_solver=True)
    s4 = solver4.inference()

    rows1 = list(csv.reader(open(os.path.join(solver.run_dir, "results.csv"))))
    rows4 = list(csv.reader(open(os.path.join(solver4.run_dir, "results.csv"))))
    assert rows1 == rows4
    assert json.load(open(os.path.join(solver.run_dir, "test_summary.json"))) \
        == json.load(open(os.path.join(solver4.run_dir, "test_summary.json")))
    assert s1 == s4
