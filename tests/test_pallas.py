"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.dccrn import _stft_bases
from speech_enhancement_tpu.ops.pallas.stft import stft_pallas
from speech_enhancement_tpu.ops.stft import _rfft_basis, hann_window


def test_stft_pallas_matches_conv_stft(rng):
    # DCCRN geometry: win 400 / hop 100 / fft 512 (basis includes window)
    fwd, _, _ = _stft_bases(400, 512)  # [400, 514]
    x = rng.standard_normal((2, 16000 + 600)).astype(np.float32) * 0.3
    got = np.asarray(stft_pallas(jnp.asarray(x), fwd, 100, 400, interpret=True))
    # reference computation: explicit framing + matmul
    n_frames = (x.shape[1] - 400) // 100 + 1
    starts = np.arange(n_frames) * 100
    frames = np.stack([x[:, s : s + 400] for s in starts], axis=1)
    want = frames @ fwd
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_pallas_matches_stft_custom_geometry(rng):
    # stft_custom geometry: win 512 / hop 128, Hann window folded into basis
    br, bi = _rfft_basis(512)
    window = np.asarray(hann_window(512))
    basis = np.concatenate([br, bi], axis=1) * window[:, None]  # [512, 514]
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    got = np.asarray(stft_pallas(jnp.asarray(x), basis, 128, 512, interpret=True))
    n_frames = (32000 - 512) // 128 + 1
    starts = np.arange(n_frames) * 128
    frames = np.stack([x[:, s : s + 512] for s in starts], axis=1) * window
    want = np.concatenate([frames @ br, frames @ bi], axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_pallas_non_block_multiple_frames(rng):
    fwd, _, _ = _stft_bases(400, 512)
    # frame count deliberately not a multiple of FRAMES_PER_BLOCK
    x = rng.standard_normal((1, 7000)).astype(np.float32)
    got = np.asarray(stft_pallas(jnp.asarray(x), fwd, 100, 400, interpret=True))
    assert got.shape == ((7000 - 400) // 100 + 1, 514)[0:1] + got.shape[1:] or True
    n_frames = (7000 - 400) // 100 + 1
    assert got.shape == (1, n_frames, 514)
