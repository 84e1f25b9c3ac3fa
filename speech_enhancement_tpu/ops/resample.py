"""Polyphase windowed-sinc resampling (julius-equivalent), in JAX.

The reference resamples with the ``julius`` package: datasets to 16 kHz
(src/dataset.py:117-122), Demucs' internal 2x up/down sampling
(src/model/demucs.py:469-486), and Clarity scoring to 44.1 kHz
(src/solver.py:723-746). ``julius`` is not in this image, so the same
algorithm — a Hann-windowed sinc low-pass evaluated at ``new_sr`` fractional
phases, applied as a strided correlation — is implemented here as a single
``lax.conv_general_dilated`` with the phase bank as output channels, which
XLA maps onto the MXU.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _kernel_bank(old_sr: int, new_sr: int, zeros: int, rolloff: float):
    """Phase bank [new_sr, 1, K] for gcd-reduced rates; returns (bank, half_width)."""
    # Cutoff in cycles per *input* sample.
    fc = 0.5 * rolloff * min(1.0, new_sr / old_sr)
    half_width = int(math.ceil(zeros / (2.0 * fc)))
    k = np.arange(-half_width, half_width + 1, dtype=np.float64)
    phases = np.arange(new_sr, dtype=np.float64) * old_sr / new_sr  # fractional centers
    t = phases[:, None] - k[None, :]  # h(offset_p - d)
    window = np.cos(np.pi * t * fc / zeros / 2.0) ** 2  # Hann over +-zeros/(2 fc)
    window = np.where(np.abs(t) <= half_width + 1e-9, window, 0.0)
    kernel = 2.0 * fc * np.sinc(2.0 * fc * t) * window
    # numpy (not jnp) so the cache never captures a tracer from a jit trace
    return kernel[:, None, :].astype(np.float32), half_width


@partial(jax.jit, static_argnames=("old_sr", "new_sr", "zeros", "rolloff", "output_length"))
def resample_frac(
    x: jnp.ndarray,
    old_sr: int,
    new_sr: int,
    zeros: int = 24,
    rolloff: float = 0.945,
    output_length: int | None = None,
) -> jnp.ndarray:
    """Resample [..., T] from ``old_sr`` to ``new_sr`` (julius.resample_frac API)."""
    gcd = math.gcd(old_sr, new_sr)
    old, new = old_sr // gcd, new_sr // gcd
    length = x.shape[-1]
    target = int(math.ceil(new_sr * length / old_sr)) if output_length is None else output_length
    if old == new:
        return x
    bank, half_width = _kernel_bank(old, new, zeros, rolloff)

    lead = x.shape[:-1]
    flat = x.reshape(-1, 1, length).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (half_width, half_width + old)))
    out = jax.lax.conv_general_dilated(
        flat, jnp.asarray(bank),
        window_strides=(old,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, Q]
    out = jnp.swapaxes(out, -1, -2).reshape(flat.shape[0], -1)  # interleave phases
    out = out[:, :target]
    return out.reshape(*lead, target).astype(x.dtype)


def upsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """2x upsample (Demucs' julius.resample_frac(x, 1, 2), demucs.py:469-470)."""
    return resample_frac(x, 1, 2, zeros=zeros)


def downsample2(x: jnp.ndarray, zeros: int = 56) -> jnp.ndarray:
    """2x downsample (Demucs' julius.resample_frac(x, 2, 1))."""
    return resample_frac(x, 2, 1, zeros=zeros)
