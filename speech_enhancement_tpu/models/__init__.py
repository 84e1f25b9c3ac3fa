"""Model zoo + registry (reference: src/distrib.py:226-242 ``get_model``).

Every entry maps a registry name to (module path, class name), imported
lazily. ``build_model`` extracts exactly the constructor fields the class
declares from the config bag (the reference passes the whole model config as
**kwargs and relies on models ignoring extras, distrib.py:240-242 — here the
filtering is explicit and typo-safe).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Tuple, Type

import flax.linen as nn

from speech_enhancement_tpu.models.types import SignalSpec  # noqa: F401

_PKG = "speech_enhancement_tpu.models"

_REGISTRY = {
    "dnn": (f"{_PKG}.dnn", "DNN"),
    "mel-rnn": (f"{_PKG}.mel_rnn", "MelRNN"),
    "rnn-stft-mask": (f"{_PKG}.stft_rnn", "RNNSTFTMask"),
    "crn": (f"{_PKG}.crn", "CRN"),
    "unet": (f"{_PKG}.unet", "UNet"),
    "dcunet": (f"{_PKG}.dcunet", "DCUnet"),
    "dccrn": (f"{_PKG}.dccrn", "DCCRN"),
    "wav-unet": (f"{_PKG}.wav_unet", "WavUNet"),
    "demucs": (f"{_PKG}.demucs", "Demucs"),
    "conv-tasnet": (f"{_PKG}.conv_tasnet", "ConvTasNet"),
    # registered here although the reference leaves it out of its registry
    # (distrib.py:227-238) and only forward-tests it
    "sepformer": (f"{_PKG}.sepformer", "Sepformer"),
    "tcn": (f"{_PKG}.tcn", "DilatedTCN"),
}


def model_names() -> list:
    return sorted(_REGISTRY)


def get_model_class(name: str) -> Type[nn.Module]:
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; options: {sorted(_REGISTRY)}")
    module_path, class_name = _REGISTRY[name]
    return getattr(importlib.import_module(module_path), class_name)


def build_model(model_config) -> Tuple[nn.Module, SignalSpec]:
    """Instantiate a model from the config bag; returns (module, spec)."""
    cls = get_model_class(str(model_config.name))
    fields = {f.name for f in dataclasses.fields(cls)} - {"SPEC", "parent", "name"}
    cfg = model_config.to_dict() if hasattr(model_config, "to_dict") else dict(model_config)
    kwargs = {k: _clean(v) for k, v in cfg.items() if k in fields}
    module = cls(**kwargs)
    return module, cls.SPEC


def _clean(value):
    if isinstance(value, list):
        return tuple(_clean(v) for v in value)
    return value


def param_count(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def param_megabytes(params) -> float:
    import jax

    return sum(p.size * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params)) / 1e6
