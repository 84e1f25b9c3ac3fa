"""Config system tests (reference surface: src/utils.py:135-239, src/conf/config.yaml)."""

import os
import tempfile

import pytest

from speech_enhancement_tpu.config import (
    Config,
    load_config,
    load_yaml,
    save_yaml,
    with_defaults,
)

YAML_TEXT = """
seed: 10
optim:
  optim: adam
  lr: 0.0003
  loss: mse
  clip_grad: 5
  pit: true
model:
  name: dnn
  n_fft: 512
  hop_length: 128
  win_length: 512
  n_layers: 4
  hidden_layer: 1024
dset:
  name: VoiceBankDEMAND
  norm: z-score
solver:
  batch_size: 16
  epochs: 800
  validation:
    metric: loss
"""


def _write(tmp, text):
    path = os.path.join(tmp, "config.yaml")
    with open(path, "w") as f:
        f.write(text)
    return path


def test_load_yaml_attribute_access():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = load_yaml(_write(tmp, YAML_TEXT))
    assert cfg.optim.lr == 0.0003
    assert cfg.model.name == "dnn"
    assert cfg.solver.validation.metric == "loss"
    assert cfg.optim.pit is True


def test_defaults_fill_missing():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = load_config(_write(tmp, YAML_TEXT))
    assert cfg.optim.beta1 == 0.9  # default
    assert cfg.solver.patience == 40
    assert cfg.model.sample_rate == 16000
    assert cfg.solver.batch_size == 16  # user value kept


def test_round_trip():
    cfg = Config({"a": {"b": [1, 2, {"c": 3}]}, "d": "x"})
    assert Config(cfg.to_dict()) == cfg
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out.yaml")
        save_yaml(cfg, path)
        assert load_yaml(path) == cfg


def test_missing_attr_raises():
    cfg = Config({"a": 1})
    with pytest.raises(AttributeError):
        _ = cfg.nope
    assert cfg.get("nope", 7) == 7


def test_validation_rejects_bad_values():
    bad = Config({"model": {"n_fft": 512, "hop_length": 0, "win_length": 512}})
    with pytest.raises(ValueError):
        with_defaults(bad)
    bad2 = Config({"optim": {"optim": "rmsprop"}})
    with pytest.raises(ValueError):
        with_defaults(bad2)


def test_reference_yaml_loads_unchanged():
    # The reference's own config file must parse through our loader.
    ref = "/root/reference/src/conf/config.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = load_yaml(ref)
    assert cfg.model.n_fft == 512
    assert cfg.solver.test.metric == "sisdr"


def test_reference_yaml_builds_model_and_optimizer():
    # the reference's shipped config must drive our factories end-to-end
    ref = "/root/reference/src/conf/config.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.train.losses import get_loss_function
    from speech_enhancement_tpu.train.solver import get_optimizer

    cfg = load_config(ref)
    model, spec = build_model(cfg.model)  # conv-tasnet
    assert spec.multi_speaker
    get_optimizer(cfg.optim)
    get_loss_function(cfg.optim.loss)
