"""Hearing-aid chain tests (reference: src/ha/, test/test_clarity_baseline.py)."""

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ha import NALR, Compressor, amplify, convert_audio_channels

AUDIOGRAM = {
    "audiogram_cfs": [250, 500, 1000, 2000, 3000, 4000, 6000, 8000],
    "audiogram_levels_l": [25, 40, 55, 65, 65, 70, 65, 60],
    "audiogram_levels_r": [20, 30, 55, 65, 65, 75, 60, 50],
}


def test_nalr_gain_rule_monotone():
    nalr = NALR(nfir=220, fs=44100)
    flat = nalr.nalr_gains_db(np.zeros(6))
    lossy = nalr.nalr_gains_db(np.full(6, 60.0))
    assert np.all(lossy >= flat)
    assert np.all(flat >= 0)  # clipped at 0 dB


def test_nalr_zero_loss_is_delay():
    nalr = NALR(nfir=128, fs=44100)
    taps = nalr.build(np.zeros(8), np.asarray(AUDIOGRAM["audiogram_cfs"], float))
    assert taps[64] == 1.0 and np.sum(np.abs(taps)) == 1.0


def test_nalr_boosts_high_frequencies():
    fs = 16000
    nalr = NALR(nfir=220, fs=fs)
    taps = nalr.build(
        np.asarray(AUDIOGRAM["audiogram_levels_l"], float),
        np.asarray(AUDIOGRAM["audiogram_cfs"], float),
    )
    # measure gain at 250 Hz vs 4 kHz through the filter
    t = np.arange(fs) / fs
    for freq, expected_min_gain in ((250, 0.5), (4000, 10.0)):
        tone = np.sin(2 * np.pi * freq * t).astype(np.float32)
        out = np.asarray(NALR.apply(jnp.asarray(taps), jnp.asarray(tone)[None]))[0]
        gain = np.std(out[fs // 4 : -fs // 4]) / np.std(tone)
        if freq == 4000:
            assert gain > expected_min_gain


def test_nalr_apply_full_padding_shape():
    taps = jnp.asarray(np.random.default_rng(0).standard_normal(129).astype(np.float32))
    wav = jnp.zeros((2, 3, 1000))
    out = NALR.apply(taps, wav)
    assert out.shape == (2, 3, 1000 + 128)


def test_compressor_matches_reference_loop(rng):
    fs = 8000
    comp = Compressor(fs=fs, attack=5, release=20, threshold=0.1,
                      attenuation=0.0001, rms_buffer_size=0.05)
    sig = (rng.standard_normal(4000) * 0.5).astype(np.float32)

    # literal reference recurrence (compressor.py:85-104)
    win = comp.win_len
    padded = np.concatenate([np.zeros(win - 1), sig])
    rms = np.sqrt(np.convolve(padded**2, np.ones(win), mode="valid") / win + 1e-8)
    curr = 1.0
    want = []
    for r in rms:
        if r > comp.threshold:
            temp = r * comp.attenuation + (1 - comp.attenuation) * comp.threshold
            curr = curr * (1 - comp.attack) + temp * comp.attack
        else:
            curr = comp.release + curr * (1 - comp.release)
        want.append(curr)
    want = sig * np.array(want)

    got = np.asarray(comp(jnp.asarray(sig)[None, None]))[0, 0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_compressor_attenuates_loud_passages(rng):
    comp = Compressor(fs=8000, threshold=0.05, rms_buffer_size=0.05)
    loud = np.ones(8000, np.float32) * 0.8
    out = np.asarray(comp(jnp.asarray(loud)[None, None]))[0, 0]
    assert np.abs(out[-100:]).max() < 0.8  # compressed below input level


def test_convert_audio_channels():
    wav = jnp.ones((2, 1, 100))
    assert convert_audio_channels(wav, 2).shape == (2, 2, 100)
    wav = jnp.ones((2, 4, 100))
    assert convert_audio_channels(wav, 2).shape == (2, 2, 100)
    assert convert_audio_channels(wav, 1).shape == (2, 1, 100)


def test_amplify_chain(rng):
    signal = jnp.asarray(rng.standard_normal((1, 1, 2, 4000)).astype(np.float32) * 0.1)
    enhancer = NALR(nfir=128, fs=16000)
    compressor = Compressor(fs=16000, rms_buffer_size=0.05)
    out = amplify(signal, enhancer, compressor, AUDIOGRAM, soft_clip=True)
    assert out.shape[2] == 2
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh clipped
    # compat flag reproduces the reference's identical-ears bug
    out_bug = amplify(signal, enhancer, compressor, AUDIOGRAM, stereo_bug_compat=True)
    both = np.asarray(out_bug)
    fixed = np.asarray(out)
    assert not np.allclose(both[0, 0, 1], fixed[0, 0, 1])
