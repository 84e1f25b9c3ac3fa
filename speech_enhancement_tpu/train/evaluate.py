"""Full-utterance inference: segment -> model -> overlap-discard stitch.

Reproduces the reference eval DSP (src/evaluate.py:10-98) under jit:

1. normalize the utterance (z-score / linear-scale, per config.dset.norm);
2. cut sliding windows of ``sample_rate * segment`` samples at stride
   ``win_length`` with zero fill (reference ``_prepare_input_wav_zero_filled``,
   evaluate.py:164-182);
3. run the model over all windows as one batch (the reference splits into
   two chunks as a CUDA OOM workaround, evaluate.py:48-62 — unnecessary here);
4. stitch with the reference's overlap-discard rule: window 0 is kept whole,
   every later window contributes only its last ``stride`` samples
   (evaluate.py:84-90 — NOT a crossfade; kept for output parity);
5. trim to the original length and denormalize.

Static shapes: window count is rounded up to a bucket multiple so XLA
compiles one program per bucket instead of one per utterance length.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import SignalSpec
from speech_enhancement_tpu.ops.stft import istft_custom, stft_custom

_BUCKET = 4  # window-count granularity for compilation caching


def _num_windows(length: int, window: int, stride: int) -> int:
    if length <= window:
        return 1
    return -(-(length - window) // stride) + 1


def extract_windows(wav: jnp.ndarray, window: int, stride: int, n_windows: int) -> jnp.ndarray:
    """[..., T] -> [n_windows, ..., window], zero-filled beyond the end."""
    total = window + (n_windows - 1) * stride
    pad = total - wav.shape[-1]
    if pad > 0:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
    idx = jnp.arange(n_windows)[:, None] * stride + jnp.arange(window)[None, :]
    out = wav[..., idx]  # [..., n_windows, window]
    return jnp.moveaxis(out, -2, 0)


def stitch_overlap_discard(windows: jnp.ndarray, stride: int, length: int) -> jnp.ndarray:
    """Reference stitching (evaluate.py:84-90): [N, ..., W] -> [..., length]."""
    n_windows, *mid, window = windows.shape
    head = windows[0]  # [..., W]
    if n_windows > 1:
        tails = windows[1:, ..., -stride:]  # [N-1, ..., stride]
        tails = jnp.moveaxis(tails, 0, -2).reshape(*mid, (n_windows - 1) * stride)
        full = jnp.concatenate([head, tails], axis=-1)
    else:
        full = head
    pad = length - full.shape[-1]
    if pad > 0:
        full = jnp.pad(full, [(0, 0)] * (full.ndim - 1) + [(0, pad)])
    return full[..., :length]


def evaluate_utterance(
    mixture: jnp.ndarray,
    apply_fn,
    variables,
    spec: SignalSpec,
    config,
    num_sources: Optional[int] = None,
) -> jnp.ndarray:
    """Enhance one utterance batch [B, C, T] -> [B, C, T] (or [B, S, C, T]).

    ``apply_fn(variables, inputs)`` is the model's eval-mode apply (or None
    for the identity passthrough the reference uses in tests,
    evaluate.py:65-66).
    """
    model_cfg = config.model
    norm = config.dset.norm
    sample_length = mixture.shape[-1]
    window = int(config.dset.sample_rate * model_cfg.segment)
    stride = int(model_cfg.win_length)

    if norm == "z-score":
        mean = jnp.mean(mixture, axis=-1, keepdims=True)
        std = jnp.std(mixture, axis=-1, keepdims=True, ddof=1)
        x = (mixture - mean) / (std + 1e-9)
    elif norm == "linear-scale":
        mx = jnp.max(mixture, axis=-1, keepdims=True)
        mn = jnp.min(mixture, axis=-1, keepdims=True)
        x = (mixture - mn) / (mx - mn + 1e-9)
    else:
        x = mixture

    n_win = _num_windows(sample_length, window, stride)
    n_win_padded = -(-n_win // _BUCKET) * _BUCKET
    windows = extract_windows(x, window, stride, n_win_padded)  # [N, B, C, W]
    n_windows, nbatch, nchannel, _ = windows.shape
    batched = windows.reshape(n_windows * nbatch, nchannel, window)

    if spec.domain == "stft":
        batched = stft_custom(batched, model_cfg)

    if apply_fn is None:
        output = batched
    else:
        output = apply_fn(variables, batched)

    if spec.monarch and output.ndim == batched.ndim + 1 and output.shape[1] == 1:
        output = output[:, 0]

    if spec.domain == "stft":
        output = istft_custom(output, window, model_cfg)

    if spec.multi_speaker and apply_fn is not None:
        n_src = num_sources or output.shape[1]
        output = output.reshape(n_windows, nbatch, n_src, nchannel, window)
    else:
        output = output.reshape(n_windows, nbatch, nchannel, window)

    output = output[:n_win]
    enhanced = stitch_overlap_discard(output, stride, sample_length)

    if norm == "z-score":
        denorm_mean, denorm_std = mean, std
        if spec.multi_speaker and apply_fn is not None:
            denorm_mean, denorm_std = mean[:, None], std[:, None]
        enhanced = enhanced * (denorm_std + 1e-9) + denorm_mean
    elif norm == "linear-scale":
        denorm_mx, denorm_mn = mx, mn
        if spec.multi_speaker and apply_fn is not None:
            denorm_mx, denorm_mn = mx[:, None], mn[:, None]
        enhanced = enhanced * (denorm_mx - denorm_mn + 1e-9) + denorm_mn
    return enhanced
