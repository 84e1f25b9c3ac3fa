"""STFT / iSTFT front-end, torch-convention-exact, TPU-first.

Reproduces the reference's transform contract bit-for-bit (within float
tolerance):

* forward: Hann(periodic) window of ``win_length`` zero-padded centered to
  ``n_fft``, ``center=True`` reflect padding, one-sided rFFT, and the
  reference's extra ``1 / win_length`` scaling (src/evaluate.py:101-129);
* inverse: windowed overlap-add divided by the squared-window envelope,
  center-trimmed, ``* win_length`` rescale (src/evaluate.py:130-162).

Two compute paths:

* ``method="fft"``    — XLA's native FFT.
* ``method="matmul"`` — framed matmul against a precomputed rFFT basis
  (the DCCRN ConvSTFT trick, reference src/model/dccrn.py:649-747, but as a
  single ``[n_frames, n_fft] @ [n_fft, 2F]`` MXU matmul instead of a conv).
  On TPU this fuses the window multiply into the matmul and keeps the MXU
  busy; it is the default for the model-internal DCCRN front-end.

Shape contracts at the model boundary match the reference:
``stft_custom``  [B, C, T]        -> [B, C, F, T', 2]
                 [B, S, C, T]     -> [B, S, C, F, T', 2]
``istft_custom`` inverse of the above, trimmed to ``length``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ops.frame import frame_signal, overlap_add


def hann_window(win_length: int, n_fft: int | None = None, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, zero-padded centered to ``n_fft`` (torch.stft rule)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if n_fft is not None and n_fft != win_length:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    return jnp.asarray(w, dtype=dtype)


@lru_cache(maxsize=16)
def _rfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rFFT basis, shape [n_fft, F] each, F = n_fft // 2 + 1."""
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=16)
def _irfft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse basis: x[k] = Xr @ Br[k] + Xi @ Bi[k]; shapes [F, n_fft]."""
    n_freq = n_fft // 2 + 1
    f = np.arange(n_freq)[:, None]
    k = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * f * k / n_fft
    weight = np.full((n_freq, 1), 2.0 / n_fft)
    weight[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        weight[-1] = 1.0 / n_fft
    return (np.cos(ang) * weight).astype(np.float32), (-np.sin(ang) * weight).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "pad_mode", "method"),
)
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
    method: str = "fft",
) -> jnp.ndarray:
    """STFT of ``x`` [..., T] -> complex64 [..., F, n_frames] (torch.stft layout)."""
    win_length = win_length or n_fft
    window = hann_window(win_length, n_fft, dtype=x.dtype)
    if method == "pallas":
        # fused framing+window+basis matmul kernel (ops/pallas/stft.py):
        # never materializes the [T', n_fft] frame tensor in HBM
        from speech_enhancement_tpu.ops.pallas.stft import stft_pallas_diff

        if center:
            pad = n_fft // 2
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
        br, bi = _rfft_basis(n_fft)
        # window recomputed in numpy: jnp constants are tracers under jit
        n = np.arange(win_length)
        w_np = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
        if n_fft != win_length:
            left = (n_fft - win_length) // 2
            w_np = np.pad(w_np, (left, n_fft - win_length - left))
        basis = np.concatenate([br, bi], axis=1) * w_np[:, None].astype(np.float32)
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        interpret = jax.default_backend() != "tpu"
        out = stft_pallas_diff(flat, basis, hop_length, n_fft, interpret)
        n_freq = n_fft // 2 + 1
        spec = jax.lax.complex(out[..., :n_freq], out[..., n_freq:])
        spec = spec.reshape(*lead, *spec.shape[1:])
        return jnp.swapaxes(spec, -1, -2)
    frames = frame_signal(x, n_fft, hop_length, center=center, pad_mode=pad_mode)
    frames = frames * window
    if method == "matmul":
        br, bi = _rfft_basis(n_fft)
        real = jnp.matmul(frames, jnp.asarray(br), preferred_element_type=jnp.float32)
        imag = jnp.matmul(frames, jnp.asarray(bi), preferred_element_type=jnp.float32)
        spec = jax.lax.complex(real, imag)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    # [..., n_frames, F] -> [..., F, n_frames]
    return jnp.swapaxes(spec, -1, -2)


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "length", "center", "method"),
)
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    length: int | None = None,
    center: bool = True,
    method: str = "fft",
) -> jnp.ndarray:
    """Inverse STFT of complex [..., F, n_frames] -> [..., T] (torch.istft rule)."""
    win_length = win_length or n_fft
    window = hann_window(win_length, n_fft, dtype=jnp.float32)
    spec = jnp.swapaxes(spec, -1, -2)  # [..., n_frames, F]
    if method == "matmul":
        br, bi = _irfft_basis(n_fft)
        frames = (
            jnp.matmul(jnp.real(spec), jnp.asarray(br), preferred_element_type=jnp.float32)
            + jnp.matmul(jnp.imag(spec), jnp.asarray(bi), preferred_element_type=jnp.float32)
        )
    else:
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    frames = frames * window
    n_frames = frames.shape[-2]

    signal = overlap_add(frames, hop_length)
    env_frames = jnp.broadcast_to(window * window, (n_frames, n_fft))
    envelope = overlap_add(env_frames, hop_length)
    signal = signal / jnp.where(envelope > 1e-11, envelope, 1.0)

    if center:
        pad = n_fft // 2
        signal = signal[..., pad:]
        if length is not None:
            signal = signal[..., :length]
        else:
            signal = signal[..., : signal.shape[-1] - pad]
    elif length is not None:
        signal = signal[..., :length]
    return signal


def stft_custom(x: jnp.ndarray, model_config) -> jnp.ndarray:
    """Reference model-boundary STFT (src/evaluate.py:101-129).

    [B, C, T] or [B, S, C, T] -> [..., F, T', 2] real/imag-last, scaled by
    1 / win_length.
    """
    spec = stft(
        x,
        n_fft=int(model_config.n_fft),
        hop_length=int(model_config.hop_length),
        win_length=int(model_config.win_length),
        center=bool(model_config.get("center", True) if hasattr(model_config, "get") else True),
    )
    out = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return out / jnp.asarray(int(model_config.win_length), out.dtype)


def istft_custom(spec_ri: jnp.ndarray, length: int, model_config) -> jnp.ndarray:
    """Reference model-boundary iSTFT (src/evaluate.py:130-162).

    [..., F, T', 2] -> [..., length]; multiplies the 1 / win_length back.
    """
    spec_ri = spec_ri * jnp.asarray(int(model_config.win_length), spec_ri.dtype)
    spec = jax.lax.complex(spec_ri[..., 0], spec_ri[..., 1])
    return istft(
        spec,
        n_fft=int(model_config.n_fft),
        hop_length=int(model_config.hop_length),
        win_length=int(model_config.win_length),
        length=int(length),
        center=bool(model_config.get("center", True) if hasattr(model_config, "get") else True),
    )
