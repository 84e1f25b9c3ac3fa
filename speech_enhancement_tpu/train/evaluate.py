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

The ENTIRE pipeline (normalize -> window -> model -> stitch -> denormalize)
is one jitted executable per bucket: the utterance is zero-padded host-side
to the bucket's static length and the true length enters as a traced scalar
(masked statistics reproduce the unpadded normalization exactly). One
program per utterance instead of ~50 eager dispatches — on a remote-TPU
transport the eager chain's async dispatch backlog measured MINUTES per
utterance (NOTES_DEV.md round 4 "--mode test wedge"); it is also the right
shape for local chips (one host->device upload, one executable launch, one
fetch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.types import SignalSpec
from speech_enhancement_tpu.ops.stft import istft_custom, stft_custom

_BUCKET = 4  # window-count granularity for compilation caching

# (id(apply_fn), id(config), spec, norm, window, stride, num_sources) ->
# (jitted fn, apply_fn ref, config ref). The refs pin the ids for the cache
# lifetime so they cannot be recycled by the allocator.
_EVAL_CACHE: dict = {}


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


def _build_eval_fn(apply_fn, spec: SignalSpec, model_cfg, norm: str,
                   window: int, stride: int, num_sources: Optional[int]):
    """The whole-utterance pipeline as ONE traceable function.

    ``padded`` is [B, C, total] with ``total = window + (n_pad-1)*stride``
    (bucket-static) and zeros beyond the true ``length`` (traced scalar).
    Masked statistics make the normalization identical to computing over
    the unpadded utterance; windows past the true window count only write
    stitched samples at positions >= length, which the caller slices away,
    so no dynamic window-count masking is needed.
    """

    def fn(variables, padded, length):
        total = padded.shape[-1]
        # length is per-utterance [B] (a scalar broadcasts): mask [B, 1,
        # total] so a batch can mix true lengths within one bucket while
        # every utterance's statistics stay those of ITS unpadded samples
        length = jnp.reshape(length, (-1, 1, 1))
        mask = (jnp.arange(total) < length).astype(padded.dtype)
        cnt = length.astype(padded.dtype)

        if norm == "z-score":
            mean = jnp.sum(padded * mask, axis=-1, keepdims=True) / cnt
            var = jnp.sum(((padded - mean) * mask) ** 2, axis=-1,
                          keepdims=True) / (cnt - 1.0)  # ddof=1
            std = jnp.sqrt(var)
            x = (padded - mean) / (std + 1e-9) * mask
        elif norm == "linear-scale":
            big = jnp.asarray(jnp.finfo(padded.dtype).max, padded.dtype)
            valid = mask.astype(bool)
            mx = jnp.max(jnp.where(valid, padded, -big), axis=-1, keepdims=True)
            mn = jnp.min(jnp.where(valid, padded, big), axis=-1, keepdims=True)
            x = (padded - mn) / (mx - mn + 1e-9) * mask
        else:
            x = padded

        n_windows = (total - window) // stride + 1
        windows = extract_windows(x, window, stride, n_windows)  # [N, B, C, W]
        _, nbatch, nchannel, _ = windows.shape
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

        enhanced = stitch_overlap_discard(output, stride, total)

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

    return fn


def evaluate_utterance(
    mixture,
    apply_fn,
    variables,
    spec: SignalSpec,
    config,
    num_sources: Optional[int] = None,
    lengths=None,
) -> np.ndarray:
    """Enhance one utterance batch [B, C, T] -> [B, C, T] (or [B, S, C, T]).

    ``apply_fn(variables, inputs)`` is the model's eval-mode apply (or None
    for the identity passthrough the reference uses in tests,
    evaluate.py:65-66). Accepts a numpy or device array; returns numpy (the
    enhanced utterance is fetched — every caller scores/writes it host-side
    next, and fetching here keeps the device queue one-executable deep).

    ``lengths`` (batched test-time eval): per-utterance true lengths [B]
    when the rows of ``mixture`` are zero-padded to a shared T. Each
    utterance is normalized/denormalized over its OWN samples (masked
    statistics); the caller trims row b to ``lengths[b]``. Omitted =
    every row is genuinely T long (the batch-1 path).
    """
    model_cfg = config.model
    norm = str(config.dset.norm)
    window = int(config.dset.sample_rate * model_cfg.segment)
    stride = int(model_cfg.win_length)

    host = np.asarray(mixture)  # [B, C, T]
    length = host.shape[-1]
    n_win = _num_windows(length, window, stride)
    n_pad = -(-n_win // _BUCKET) * _BUCKET
    total = window + (n_pad - 1) * stride  # bucket-static padded length
    padded = np.zeros(host.shape[:-1] + (total,), host.dtype)
    padded[..., :length] = host
    length_arg = (np.asarray(lengths, np.int32) if lengths is not None
                  else np.int32(length))

    key = (id(apply_fn), id(config), spec, norm, window, stride, num_sources)
    entry = _EVAL_CACHE.get(key)
    if entry is None:
        fn = _build_eval_fn(apply_fn, spec, model_cfg, norm, window, stride,
                            num_sources)
        entry = (jax.jit(fn), apply_fn, config)
        _EVAL_CACHE[key] = entry
    enhanced = entry[0](variables, padded, length_arg)
    return np.asarray(enhanced)[..., :length]
