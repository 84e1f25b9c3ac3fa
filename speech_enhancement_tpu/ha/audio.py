"""Hearing-aid amplification chain + channel conversion (reference:
src/audio.py).

``amplify``: per-ear NAL-R FIR from the listener's audiogram -> FIR apply
-> dynamic-range compression -> optional tanh soft clip -> stereo stack
(reference amplify_torch, audio.py:33-61).

The reference overwrites the right-ear FIR with the left's (audio.py:49,
SURVEY §6b.4); the rebuild uses the correct right filter by default, with
``stereo_bug_compat=True`` replicating the reference bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ha.amplifier import NALR
from speech_enhancement_tpu.ha.compressor import Compressor


def convert_audio_channels(wav: jnp.ndarray, channels: int = 2) -> jnp.ndarray:
    """Up/down-mix [..., C, T] to ``channels`` (reference audio.py:6-31)."""
    *shape, src_channels, length = wav.shape
    if src_channels == channels:
        return wav
    if channels == 1:
        return jnp.mean(wav, axis=-2, keepdims=True)
    if src_channels == 1:
        return jnp.broadcast_to(wav, (*shape, channels, length))
    if src_channels >= channels:
        return wav[..., :channels, :]
    raise ValueError("audio has fewer channels than requested but is not mono")


def amplify(
    signal: jnp.ndarray,
    enhancer: NALR,
    compressor: Compressor,
    audiogram: dict,
    soft_clip: bool = True,
    stereo_bug_compat: bool = False,
) -> jnp.ndarray:
    """Apply the hearing-aid chain to [B, S, 2, T] -> [B, S, 2, T'].

    audiogram: {"audiogram_cfs": [...], "audiogram_levels_l": [...],
    "audiogram_levels_r": [...]} (Clarity listeners.json entry).
    """
    cfs = np.asarray(audiogram["audiogram_cfs"], float)
    fir_left = jnp.asarray(enhancer.build(audiogram["audiogram_levels_l"], cfs))
    if stereo_bug_compat:
        fir_right = fir_left  # reference bug: right FIR = left's (audio.py:49)
    else:
        fir_right = jnp.asarray(enhancer.build(audiogram["audiogram_levels_r"], cfs))

    out_l = NALR.apply(fir_left, signal[:, :, 0, :])
    out_r = NALR.apply(fir_right, signal[:, :, 1, :])
    out_l = compressor(out_l)
    out_r = compressor(out_r)
    if soft_clip:
        out_l = jnp.tanh(out_l)
        out_r = jnp.tanh(out_r)
    return jnp.stack([out_l, out_r], axis=2)
