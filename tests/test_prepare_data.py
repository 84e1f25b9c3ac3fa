"""tools/prepare_data.py: real-corpus ingestion produces loader-ready trees.

Source trees are simulated with the distribution layouts (VBD's
*_28spk_wav folder names, Clarity's clarity_data/ nesting) built from the
synthetic fixtures; the output must load through the same factories the
configs use (data/loader.py:get_train_wav_dataset).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from speech_enhancement_tpu.config import load_config
from speech_enhancement_tpu.data.synthetic import make_clarity, make_voicebank_demand

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "prepare_data.py")


def _run(*argv):
    out = subprocess.run([sys.executable, TOOL, *argv], capture_output=True,
                         text=True, cwd=REPO)
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_vbd_ingest_symlinks_and_pairs(tmp_path):
    # simulate the datashare layout: *_28spk_wav folder names
    fixture = make_voicebank_demand(str(tmp_path / "fix"), n_utterances=4,
                                    min_seconds=1.0, max_seconds=1.2)
    src = tmp_path / "download"
    os.makedirs(src)
    os.rename(os.path.join(fixture, "noisy_trainset_wav"),
              src / "noisy_trainset_28spk_wav")
    os.rename(os.path.join(fixture, "clean_trainset_wav"),
              src / "clean_trainset_28spk_wav")

    dst = str(tmp_path / "data")
    info = _run("vbd", "--src", str(src), "--dst", dst)
    assert info["noisy_trainset_wav"] == 4
    assert info["clean_trainset_wav"] == 4

    # loads through the standard factory
    from speech_enhancement_tpu.data.loader import get_train_wav_dataset
    cfg = load_config(os.path.join(REPO, "configs", "dnn_vbd.yaml"))
    cfg.dset.wav = dst
    cfg.dset.split = [0.5, 0.25, 0.25]
    cfg.dset.segment = 1
    train, val, test = get_train_wav_dataset(cfg.dset, cfg.model)
    assert len(train) >= 1 and len(test) >= 1
    item = train[0]
    mixture = np.asarray(item["mixture"] if isinstance(item, dict) else item[0])
    assert np.isfinite(mixture).all()


def test_vbd_unpaired_fails(tmp_path):
    fixture = make_voicebank_demand(str(tmp_path / "fix"), n_utterances=2,
                                    min_seconds=1.0, max_seconds=1.1)
    src = tmp_path / "download"
    os.makedirs(src)
    os.rename(os.path.join(fixture, "noisy_trainset_wav"),
              src / "noisy_trainset_wav")
    os.rename(os.path.join(fixture, "clean_trainset_wav"),
              src / "clean_trainset_wav")
    os.remove(src / "clean_trainset_wav" / "p000_000.wav")
    out = subprocess.run(
        [sys.executable, TOOL, "vbd", "--src", str(src),
         "--dst", str(tmp_path / "data")],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode != 0
    assert "unpaired" in out.stderr


def test_clarity_ingest_builds_metadata(tmp_path):
    # simulate the challenge package: clarity_data/ nesting, no custom
    # metadata (the tool must derive scene lists + time spans by scanning)
    fixture = make_clarity(str(tmp_path / "fix"), n_scenes=3, seconds=1.1)
    src = tmp_path / "download" / "clarity_data"
    os.makedirs(src.parent)
    os.rename(fixture, str(src))
    # strip the fixture's prebuilt custom metadata to force the scan path
    import shutil
    shutil.rmtree(src / "custom_metadata")
    # listeners metadata as shipped by the challenge
    meta = src / "metadata"
    os.makedirs(meta)
    with open(meta / "listeners.json", "w") as fh:
        json.dump({"L0001": {"name": "L0001",
                             "audiogram_cfs": [250, 500, 1000, 2000, 3000,
                                               4000, 6000, 8000],
                             "audiogram_levels_l": [20] * 8,
                             "audiogram_levels_r": [25] * 8}}, fh)

    dst = str(tmp_path / "data" / "Clarity")
    info = _run("clarity", "--src", str(tmp_path / "download"), "--dst", dst)
    assert info["train"] == 3
    assert info["listeners.json"] is True

    with open(os.path.join(dst, "custom_metadata", "scenes.train.json")) as fh:
        scenes = json.load(fh)
    assert scenes == ["S00001", "S00002", "S00003"]
    with open(os.path.join(dst, "custom_metadata",
                           "scenes.train.time.json")) as fh:
        times = json.load(fh)
    assert all(t[1] > t[0] for t in times.values())

    from speech_enhancement_tpu.data.loader import get_train_wav_dataset
    cfg = load_config(os.path.join(REPO, "configs",
                                   "rnn_stft_mask_clarity.yaml"))
    cfg.dset.wav = dst
    cfg.dset.split = [0.4, 0.3, 0.3]
    cfg.dset.segment = 1
    train, _, test = get_train_wav_dataset(cfg.dset, cfg.model)
    assert len(train) >= 1 and len(test) >= 1

    # the hearing-aid yaml surface resolves against the ingested tree
    from speech_enhancement_tpu.ha.scoring import ClarityScorer
    ha_yaml = tmp_path / "ha.yaml"
    with open(os.path.join(REPO, "configs", "ha_clarity.yaml")) as fh:
        text = fh.read().replace("./data/Clarity", dst)
    with open(ha_yaml, "w") as fh:
        fh.write(text)
    scorer = ClarityScorer(str(ha_yaml), input_sr=16000)
    assert len(scorer.listeners) == 1
