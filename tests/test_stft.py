"""Golden-value tests for the STFT front-end against torch.stft/istft.

The reference's transform is torch.stft/istft with specific conventions
(reference: src/evaluate.py:101-162); these tests pin our implementation to
torch CPU outputs and check the round-trip identity the reference tests
(reference: test/test_train.py:37-101, tolerance 1e-5).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from speech_enhancement_tpu.config import Config
from speech_enhancement_tpu.ops import (
    frame_signal,
    hann_window,
    istft,
    istft_custom,
    overlap_add,
    stft,
    stft_custom,
)

CFG = Config({"n_fft": 512, "hop_length": 128, "win_length": 512, "center": True})


def _torch_stft(x, n_fft, hop, win):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="reflect",
        normalized=False,
        return_complex=True,
    ).numpy()


@pytest.mark.parametrize("n_fft,hop,win", [(512, 128, 512), (320, 160, 320), (512, 100, 400)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal((3, 16000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, win))
    ref = _torch_stft(x, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_stft_matmul_matches_fft(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    a = np.asarray(stft(jnp.asarray(x), 512, 128, 512, method="fft"))
    b = np.asarray(stft(jnp.asarray(x), 512, 128, 512, method="matmul"))
    np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_istft_matches_torch(rng, method):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    spec = _torch_stft(x, 512, 128, 512)
    ref = torch.istft(
        torch.from_numpy(spec),
        n_fft=512,
        hop_length=128,
        win_length=512,
        window=torch.hann_window(512),
        center=True,
        length=16000,
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec), 512, 128, 512, length=16000, method=method))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_round_trip_identity(rng):
    # Mirrors the reference's round-trip tolerance test (test_train.py:100).
    x = rng.standard_normal((2, 1, 64000)).astype(np.float32) * 0.5
    spec = stft_custom(jnp.asarray(x), CFG)
    assert spec.shape == (2, 1, 257, 501, 2)
    back = istft_custom(spec, 64000, CFG)
    assert np.max(np.abs(np.asarray(back) - x)) < 1e-5


def test_stft_custom_scaling(rng):
    x = rng.standard_normal((1, 1, 8000)).astype(np.float32)
    spec = stft_custom(jnp.asarray(x), CFG)
    ref = _torch_stft(x.reshape(1, 8000), 512, 128, 512) / 512.0
    np.testing.assert_allclose(
        np.asarray(spec)[0, 0, ..., 0] + 1j * np.asarray(spec)[0, 0, ..., 1],
        ref[0],
        atol=1e-6,
    )


def test_stft_multi_speaker_layout(rng):
    x = rng.standard_normal((2, 2, 1, 8000)).astype(np.float32)
    spec = stft_custom(jnp.asarray(x), CFG)
    assert spec.shape == (2, 2, 1, 257, 63, 2)
    back = istft_custom(spec, 8000, CFG)
    assert back.shape == (2, 2, 1, 8000)


def test_frame_overlap_add_inverse(rng):
    x = rng.standard_normal((4, 4096)).astype(np.float32)
    frames = frame_signal(jnp.asarray(x), 512, 128)
    # With a rectangular window, OLA of frames = signal * overlap count where
    # fully covered; cross-check the dedicated envelope logic via istft instead.
    assert frames.shape == (4, 1 + (4096 - 512) // 128, 512)
    ola = overlap_add(frames, 128)
    assert ola.shape[-1] == (frames.shape[1] - 1) * 128 + 512


def test_frame_generic_hop_matches_gather(rng):
    x = rng.standard_normal((2, 3000)).astype(np.float32)
    a = np.asarray(frame_signal(jnp.asarray(x), 512, 128))
    starts = np.arange(a.shape[1]) * 128
    ref = np.stack([x[:, s : s + 512] for s in starts], axis=1)
    np.testing.assert_array_equal(a, ref)


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(400, 512))
    ref = torch.hann_window(400).numpy()
    padded = np.zeros(512, np.float32)
    padded[56:456] = ref
    np.testing.assert_allclose(ours, padded, atol=1e-6)
