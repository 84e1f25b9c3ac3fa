"""Clarity hearing-aid scoring pipeline (reference: src/solver.py:723-746
``compute_metric_clarity`` + the external evaluate_clarity recipe).

Wires the full path the reference delegates to the Clarity repo: load the
hearing-aid config (OmegaConf-style YAML with ``${...}`` interpolation,
src/ha/conf/config.yaml) and the listener audiograms (listeners.json,
solver.py:124-130), then per test utterance resample to the HA rate,
amplify with the listener's NAL-R + compressor chain (src/audio.py:33-61),
and score HASPI/HASQI. The HASPI/HASQI *metrics themselves* live in the
external ``clarity`` package — gated exactly like the reference gates
``evaluate_clarity`` (solver.py:82-89); the amplification chain runs
regardless, so it is hermetically testable.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from speech_enhancement_tpu.ha.amplifier import NALR
from speech_enhancement_tpu.ha.audio import amplify
from speech_enhancement_tpu.ha.compressor import Compressor
from speech_enhancement_tpu.ops.resample import resample_frac

_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve(value, root: dict):
    """Minimal OmegaConf-style ``${dotted.path}`` interpolation."""
    if isinstance(value, dict):
        return {k: _resolve(v, root) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve(v, root) for v in value]
    if isinstance(value, str):
        for _ in range(8):  # nested interpolations
            match = _INTERP.search(value)
            if not match:
                break
            node = root
            for part in match.group(1).split("."):
                node = node[part]
            value = value[: match.start()] + str(node) + value[match.end():]
        return value
    return value


def load_ha_config(path: str) -> dict:
    """Load the hearing-aid YAML (reference src/ha/conf/config.yaml surface:
    ``path.listeners_file``, ``nalr``, ``compressor``, ``soft_clip``)."""
    with open(path) as handle:
        raw = yaml.safe_load(handle)
    return _resolve(raw, raw)


class ClarityScorer:
    """Per-utterance Clarity HA amplification + HASPI/HASQI scoring.

    ``score()`` amplifies enhanced AND mixture through the listener chain
    (dual scoring like the reference, solver.py:610-616) and returns
    ``{haspi,hasqi}_{enhance,mixture}`` — ``None`` for the metric values
    when the external ``clarity`` package is absent.
    """

    def __init__(self, ha_config_path: str, input_sr: int):
        cfg = load_ha_config(ha_config_path)
        nalr_cfg = cfg.get("nalr", {})
        comp_cfg = cfg.get("compressor", {})
        self.fs = int(nalr_cfg.get("fs", 44100))
        self.input_sr = int(input_sr)
        self.enhancer = NALR(nfir=int(nalr_cfg.get("nfir", 220)), fs=self.fs)
        self.compressor = Compressor(
            fs=self.fs,
            threshold=float(comp_cfg.get("threshold", 0.35)),
            attenuation=float(comp_cfg.get("attenuation", 0.1)),
            attack=float(comp_cfg.get("attack", 50)),
            release=float(comp_cfg.get("release", 1000)),
            rms_buffer_size=float(comp_cfg.get("rms_buffer_size", 0.064)),
        )
        self.soft_clip = bool(cfg.get("soft_clip", True))

        paths = cfg.get("path", {}) or {}
        listeners_file = paths.get("listeners_file", "")
        if not listeners_file or not os.path.exists(listeners_file):
            raise FileNotFoundError(
                f"ha config {ha_config_path}: path.listeners_file "
                f"{listeners_file!r} not found (Clarity listeners.json)"
            )
        with open(listeners_file, encoding="utf-8") as handle:
            self.listeners: Dict[str, dict] = json.load(handle)

        self.scene_listeners: Optional[Dict[str, List[str]]] = None
        scenes_file = paths.get("scenes_listeners_file", "")
        if scenes_file and os.path.exists(scenes_file):
            with open(scenes_file, encoding="utf-8") as handle:
                self.scene_listeners = json.load(handle)

    # ------------------------------------------------------------------
    def listeners_for_scene(self, scene: str) -> List[dict]:
        if self.scene_listeners and scene in self.scene_listeners:
            ids = self.scene_listeners[scene]
            return [self.listeners[i] for i in ids if i in self.listeners]
        return list(self.listeners.values())

    @staticmethod
    def _host_cpu():
        """HA metric prep runs on the HOST CPU backend: it feeds the numpy
        HASPI/HASQI ear model and is called from scoring worker threads —
        keeping it off the accelerator leaves the device queue to the
        inference loop, and on a remote-TPU transport the compressor's
        log-depth ``associative_scan`` compile measured minutes through the
        remote compile service vs seconds locally (NOTES_DEV.md round 4)."""
        return jax.local_devices(backend="cpu")[0]

    def amplify_for_listener(self, signal: np.ndarray, listener: dict) -> np.ndarray:
        """[C, T] at the HA rate -> [2, T'] through NAL-R + compressor."""
        with jax.default_device(self._host_cpu()):
            sig = jnp.asarray(signal)
            if sig.shape[0] == 1:
                sig = jnp.broadcast_to(sig, (2, sig.shape[-1]))
            out = amplify(sig[None, None, :2], self.enhancer, self.compressor,
                          listener, soft_clip=self.soft_clip)
            return np.asarray(out[0, 0])

    def _resample(self, signal: np.ndarray) -> np.ndarray:
        if self.input_sr == self.fs:
            return np.asarray(signal)
        with jax.default_device(self._host_cpu()):
            return np.asarray(
                resample_frac(jnp.asarray(signal), self.input_sr, self.fs)
            )

    @staticmethod
    def _haspi_hasqi(reference: np.ndarray, processed: np.ndarray, fs: int,
                     listener: dict):
        """Better-ear HASPI/HASQI: external ``clarity`` package when
        installed (the reference's backend, src/solver.py:82-89), else the
        native from-paper implementation in ha/earmodel.py — the same
        preferred->native fallback pattern used for PESQ
        (train/metrics.py)."""
        try:
            from clarity.evaluator.haspi import haspi_v2_be  # type: ignore
            from clarity.evaluator.hasqi import hasqi_v2_be  # type: ignore
        except ImportError:
            from speech_enhancement_tpu.ha.earmodel import (
                haspi_v1_better_ear, hasqi_v2_better_ear)
            args = (
                reference[0], reference[-1], processed[0], processed[-1],
                fs,
                np.asarray(listener["audiogram_levels_l"], dtype=float),
                np.asarray(listener["audiogram_levels_r"], dtype=float),
                np.asarray(listener["audiogram_cfs"], dtype=float),
            )
            return haspi_v1_better_ear(*args), hasqi_v2_better_ear(*args)
        kwargs = dict(
            reference_left=reference[0], reference_right=reference[-1],
            processed_left=processed[0], processed_right=processed[-1],
            sample_rate=fs,
            audiogram_left=np.asarray(listener["audiogram_levels_l"]),
            audiogram_right=np.asarray(listener["audiogram_levels_r"]),
        )
        try:
            return float(haspi_v2_be(**kwargs)), float(hasqi_v2_be(**kwargs))
        except TypeError:  # older clarity API: positional + cfs arrays
            cfs = np.asarray(listener["audiogram_cfs"])
            return (
                float(haspi_v2_be(reference[0], reference[-1], processed[0],
                                  processed[-1], fs,
                                  np.asarray(listener["audiogram_levels_l"]),
                                  np.asarray(listener["audiogram_levels_r"]),
                                  cfs)),
                float(hasqi_v2_be(reference[0], reference[-1], processed[0],
                                  processed[-1], fs,
                                  np.asarray(listener["audiogram_levels_l"]),
                                  np.asarray(listener["audiogram_levels_r"]),
                                  cfs)),
            )

    def score(self, clean: np.ndarray, mixture: np.ndarray,
              enhanced: np.ndarray, name: str) -> Dict[str, Optional[float]]:
        """Dual HA scoring of one utterance ([C, T] arrays at input_sr)."""
        scene = name.split("_")[0]
        clean_rs = self._resample(clean)
        mixture_rs = self._resample(mixture)
        enhanced_rs = self._resample(enhanced)
        if clean_rs.shape[0] == 1:
            clean_rs = np.broadcast_to(clean_rs, (2, clean_rs.shape[-1]))

        agg: Dict[str, list] = {
            "haspi_enhance": [], "hasqi_enhance": [],
            "haspi_mixture": [], "hasqi_mixture": [],
        }
        amplified = None
        for listener in self.listeners_for_scene(scene):
            amp_enh = self.amplify_for_listener(enhanced_rs, listener)
            amp_mix = self.amplify_for_listener(mixture_rs, listener)
            amplified = amp_enh
            h_e, q_e = self._haspi_hasqi(clean_rs, amp_enh, self.fs, listener)
            h_m, q_m = self._haspi_hasqi(clean_rs, amp_mix, self.fs, listener)
            if h_e is not None:
                agg["haspi_enhance"].append(h_e)
                agg["hasqi_enhance"].append(q_e)
                agg["haspi_mixture"].append(h_m)
                agg["hasqi_mixture"].append(q_m)

        scores: Dict[str, Optional[float]] = {
            key: (float(np.mean(vals)) if vals else None)
            for key, vals in agg.items()
        }
        scores["amplified"] = amplified  # type: ignore[assignment]
        return scores
