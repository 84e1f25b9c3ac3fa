"""Streaming DCCRN == offline DCCRN (latency-compensated, float tolerance).

The strongest possible test of serve/streaming.py: run the SAME variables
through the offline batch forward and through the chunked stream, and
assert the latency-shifted waveforms agree. Any error in a cache, FIFO
length, frame alignment, or envelope phase shows up as a gross mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models.dccrn import DCCRN
from speech_enhancement_tpu.serve import DCCRNStreamer


def _small_dccrn(**kw):
    cfg = dict(
        rnn_layers=2, rnn_units=32, win_len=400, win_inc=100, fft_len=512,
        masking_mode="E", use_clstm=True, kernel_num=(4, 8, 8),
        use_pallas_stft=False, use_pallas_mask=False,
    )
    cfg.update(kw)
    return DCCRN(**cfg)


def _init(model, batch, t, seed=0):
    wav = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, t)) * 0.1
    variables = model.init(jax.random.PRNGKey(seed), wav)
    return variables, wav


@pytest.mark.parametrize("masking_mode", ["E", "C", "R"])
def test_stream_matches_offline(masking_mode):
    model = _small_dccrn(masking_mode=masking_mode)
    batch, t = 2, 4000
    variables, wav = _init(model, batch, t)
    offline = np.asarray(model.apply(variables, wav))

    streamer = DCCRNStreamer(model, variables, chunk_frames=8)
    got = np.asarray(streamer.enhance(wav))
    assert got.shape == offline.shape
    scale = max(1e-6, np.abs(offline).max())
    # exact agreement everywhere except the final `latency` samples, where
    # offline truncation implies zero future ACTIVATIONS inside the decoder
    # while a true stream feeds continued (bias/LSTM-driven) frames — the
    # documented end-of-stream semantic (serve/streaming.py)
    interior = t - streamer.latency
    np.testing.assert_allclose(got[:, :interior], offline[:, :interior],
                               atol=2e-4 * scale, rtol=0,
                               err_msg=f"mode {masking_mode}")
    # the tail still tracks closely (same spectrum frames, differing only
    # through the zero-future boundary condition)
    assert np.abs(got[:, interior:] - offline[:, interior:]).max() < 0.05


def test_stream_prefix_is_zero_latency_exact():
    model = _small_dccrn()
    batch, t = 1, 3000
    variables, wav = _init(model, batch, t, seed=3)
    streamer = DCCRNStreamer(model, variables, chunk_frames=10)
    assert streamer.latency == 3 * 100 + 300  # n_layers*hop + (win-hop)
    state = streamer.init_state(batch)
    cs = streamer.chunk_samples
    state, out0 = streamer.step(state, jnp.asarray(wav[:, :cs]))
    # the emitted warmup is zero until the first real synthesis window
    # bleeds in: n_layers * hop samples exactly zero, then pad samples of
    # pre-output bleed that enhance() discards
    n_zero = min(cs, streamer.latency - (streamer.win - streamer.hop))
    assert np.abs(np.asarray(out0[:, :n_zero])).max() == 0.0


def test_stream_chunk_size_invariance():
    # the stream state machine must not depend on the chunk size
    model = _small_dccrn()
    batch, t = 1, 3200
    variables, wav = _init(model, batch, t, seed=7)
    a = np.asarray(DCCRNStreamer(model, variables, chunk_frames=4).enhance(wav))
    b = np.asarray(DCCRNStreamer(model, variables, chunk_frames=16).enhance(wav))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stream_state_shapes_fixed():
    # one compiled step serves the stream: state pytree shapes are static
    model = _small_dccrn()
    variables, wav = _init(model, 1, 2000, seed=9)
    streamer = DCCRNStreamer(model, variables, chunk_frames=8)
    state = streamer.init_state(1)
    shapes0 = jax.tree_util.tree_map(lambda a: a.shape, state)
    cs = streamer.chunk_samples
    state, _ = streamer.step(state, jnp.asarray(wav[:, :cs]))
    state, _ = streamer.step(state, jnp.asarray(wav[:, cs:2 * cs]))
    shapes1 = jax.tree_util.tree_map(lambda a: a.shape, state)
    assert shapes0 == shapes1


def test_stream_bf16_tracks_f32():
    # the serving fast path: bf16 compute stream stays close to f32 offline
    f32 = _small_dccrn()
    variables, wav = _init(f32, 1, 3000, seed=11)
    offline = np.asarray(f32.apply(variables, wav))
    bf16 = _small_dccrn(dtype="bfloat16")
    got = np.asarray(DCCRNStreamer(bf16, variables, chunk_frames=8).enhance(wav))
    scale = max(1e-6, np.abs(offline).max())
    assert np.abs(got - offline).max() / scale < 0.1


# ---------------------------------------------------------------------------
# CRN streaming (second streamable family, fully causal)
# ---------------------------------------------------------------------------

def _crn_offline(model, variables, wav, cfg):
    """The exact offline inference path: stft_custom -> CRN -> istft_custom
    (train/evaluate.py model-boundary convention)."""
    from speech_enhancement_tpu.ops.stft import istft_custom, stft_custom

    spec = stft_custom(wav[:, None, :], cfg)        # [B, 1, F, T', 2]
    out = model.apply(variables, spec, train=False)
    return np.asarray(istft_custom(out, wav.shape[-1], cfg))[:, 0]


def _crn_cfg():
    from speech_enhancement_tpu.config import Config

    return Config({"n_fft": 512, "hop_length": 128, "win_length": 512,
                   "center": True})


def test_crn_stream_matches_offline():
    from speech_enhancement_tpu.models.crn import CRN
    from speech_enhancement_tpu.serve import CRNStreamer

    model = CRN()
    cfg = _crn_cfg()
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32)) * 0.1
    from speech_enhancement_tpu.ops.stft import stft_custom
    spec = stft_custom(wav[:, None, :], cfg)
    variables = model.init(jax.random.PRNGKey(0), spec)

    offline = _crn_offline(model, variables, wav, cfg)
    streamer = CRNStreamer(model, variables, chunk_frames=8)
    got = np.asarray(streamer.enhance(wav))
    # exact everywhere except the final win samples (offline right reflect
    # pad a stream never has); NO warmup region at the head
    np.testing.assert_allclose(got[:, :-512], offline[:, :-512],
                               rtol=2e-4, atol=2e-5)


def test_crn_stream_chunk_size_invariance():
    from speech_enhancement_tpu.models.crn import CRN
    from speech_enhancement_tpu.serve import CRNStreamer

    model = CRN()
    cfg = _crn_cfg()
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((1, 3000)).astype(np.float32)) * 0.1
    from speech_enhancement_tpu.ops.stft import stft_custom
    variables = model.init(jax.random.PRNGKey(1),
                           stft_custom(wav[:, None, :], cfg))
    a = np.asarray(CRNStreamer(model, variables, chunk_frames=6).enhance(wav))
    b = np.asarray(CRNStreamer(model, variables, chunk_frames=12).enhance(wav))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_crn_stream_state_shapes_fixed():
    from speech_enhancement_tpu.models.crn import CRN
    from speech_enhancement_tpu.serve import CRNStreamer

    model = CRN()
    cfg = _crn_cfg()
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32)) * 0.1
    from speech_enhancement_tpu.ops.stft import stft_custom
    variables = model.init(jax.random.PRNGKey(2),
                           stft_custom(wav[:, None, :], cfg))
    streamer = CRNStreamer(model, variables, chunk_frames=8)
    state = streamer.init_state(1)
    shapes0 = jax.tree.map(lambda a: a.shape,
                           {k: v for k, v in state.items() if k != "fresh"})
    for c in range(2):
        state, out = streamer.step(
            state, wav[:, c * streamer.chunk_samples:(c + 1) * streamer.chunk_samples])
    shapes1 = jax.tree.map(lambda a: a.shape,
                           {k: v for k, v in state.items() if k != "fresh"})
    assert shapes0 == shapes1
