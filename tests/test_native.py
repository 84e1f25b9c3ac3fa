"""Native C library tests: WAV decode, resample, normalize parity."""

import numpy as np
import pytest

from speech_enhancement_tpu.data import native
from speech_enhancement_tpu.data.wav_io import write_wav


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library(build=True)
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_wav_decode_parity_float32(lib, tmp_path, rng):
    x = (rng.standard_normal((2, 4321)) * 0.4).astype(np.float32)
    path = str(tmp_path / "f32.wav")
    write_wav(path, x, 16000)
    got, sr = native.read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(got, x, atol=1e-7)


def test_wav_decode_parity_int16(lib, tmp_path, rng):
    x = np.clip(rng.standard_normal((1, 2000)) * 0.3, -0.9, 0.9).astype(np.float32)
    path = str(tmp_path / "i16.wav")
    write_wav(path, x, 8000, dtype="int16")
    got, sr = native.read_wav(path)
    assert sr == 8000
    np.testing.assert_allclose(got, x, atol=1e-3)


def test_resample_matches_device_kernel(lib):
    import jax.numpy as jnp

    from speech_enhancement_tpu.ops.resample import resample_frac

    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    got = native.resample(x, 48000, 16000)
    want = np.asarray(resample_frac(jnp.asarray(x), 48000, 16000))
    assert got.shape == want.shape
    sl = slice(200, -200)
    np.testing.assert_allclose(got[:, sl], want[:, sl], atol=1e-4)


def test_normalize_zscore(lib, rng):
    x = (rng.standard_normal((2, 5000)) * 3 + 1).astype(np.float32)
    orig = x.copy()
    normed, means, stds = native.normalize_zscore(x.copy())
    np.testing.assert_allclose(means[:, 0], orig.mean(axis=1), atol=1e-4)
    np.testing.assert_allclose(stds[:, 0], orig.std(axis=1, ddof=1), atol=1e-4)
    np.testing.assert_allclose(normed.mean(axis=1), 0, atol=1e-3)
    np.testing.assert_allclose(normed.std(axis=1, ddof=1), 1, atol=1e-2)


def test_wav_io_uses_native_by_default(lib, tmp_path, rng):
    from speech_enhancement_tpu.data.wav_io import read_wav

    x = (rng.standard_normal((1, 1000)) * 0.2).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, x, 16000)
    got, sr = read_wav(path)
    np.testing.assert_allclose(got, x, atol=1e-6)
