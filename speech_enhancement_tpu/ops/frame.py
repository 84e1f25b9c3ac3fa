"""Framing and overlap-add primitives.

These are the two halves of every STFT-ish op in the framework. Both are
written to lower to static-shape XLA ops that tile well on TPU:

* ``frame_signal`` — when ``hop`` divides the frame length we build frames by
  stacking ``K = frame_len / hop`` shifted chunk views (pure reshapes +
  static slices, zero gather traffic); otherwise we fall back to one gather.

* ``overlap_add`` — the scatter-free "chunked OLA" trick: pad frames to a
  multiple of ``hop``, split into K hop-sized chunks, and accumulate K
  statically-shifted adds. No ``index_add`` / ``scatter`` (the reference's
  approach, conv_tasnet.py:11-31 ``overlap_and_add`` via ``index_add_``),
  which would serialize on TPU.

Reference behavior being reproduced: torch.stft framing with center/reflect
padding (src/evaluate.py:101-129) and torch.istft overlap-add synthesis
(src/evaluate.py:130-162); also conv-tasnet's decoder OLA
(src/model/conv_tasnet.py:179-204).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _pad_center(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode=mode)


def frame_signal(
    x: jnp.ndarray,
    frame_length: int,
    hop_length: int,
    center: bool = False,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Slice ``x`` [..., T] into overlapping frames [..., n_frames, frame_length].

    With ``center=True`` the signal is first padded by ``frame_length // 2``
    on both sides with ``pad_mode`` (torch.stft convention).
    """
    if center:
        x = _pad_center(x, frame_length // 2, pad_mode)
    total = x.shape[-1]
    if total < frame_length:
        raise ValueError(f"signal length {total} < frame_length {frame_length}")
    n_frames = 1 + (total - frame_length) // hop_length

    if frame_length % hop_length == 0:
        k = frame_length // hop_length
        # Trim to what the frames actually touch, then view as hop chunks.
        used = (n_frames - 1) * hop_length + frame_length
        chunks = x[..., :used]
        n_chunks = used // hop_length
        rem = used - n_chunks * hop_length
        if rem:
            chunks = jnp.pad(chunks, [(0, 0)] * (x.ndim - 1) + [(0, hop_length - rem)])
            n_chunks += 1
        chunks = chunks.reshape(*x.shape[:-1], n_chunks, hop_length)
        parts = [chunks[..., i : i + n_frames, :] for i in range(k)]
        frames = jnp.concatenate(parts, axis=-1)
        return frames

    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


@partial(jax.jit, static_argnames=("hop_length",))
def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add frames [..., n_frames, frame_length] at stride ``hop_length``.

    Returns [..., (n_frames - 1) * hop_length + frame_length].
    """
    *lead, n_frames, frame_length = frames.shape
    k = math.ceil(frame_length / hop_length)
    pad = k * hop_length - frame_length
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    chunks = frames.reshape(*lead, n_frames, k, hop_length)
    out_chunks = n_frames + k - 1
    out = jnp.zeros((*lead, out_chunks, hop_length), frames.dtype)
    for i in range(k):
        out = out.at[..., i : i + n_frames, :].add(chunks[..., :, i, :])
    out = out.reshape(*lead, out_chunks * hop_length)
    return out[..., : (n_frames - 1) * hop_length + frame_length]
