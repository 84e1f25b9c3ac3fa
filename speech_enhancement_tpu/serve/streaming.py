"""Streaming DCCRN: chunked real-time enhancement with carried state.

DCCRN is causal in its encoder (time kernel 2, causal pad — reference
src/model/dccrn.py:358-361) and recurrent bottleneck, but each of the six
decoder deconvs has a ONE-FRAME LOOKAHEAD (the ``out[..., 1:]`` time chomp,
src/model/dccrn.py:196). A stream therefore carries:

* ``wav_tail``      — the last ``win - hop`` input samples (ConvSTFT framing
                      history; init zeros = the offline left pad,
                      src/model/dccrn.py:687-701);
* ``enc_cache[i]``  — one input frame per encoder conv (the causal pad);
* ``lstm[j]``       — the complex-LSTM (h, c) carries;
* ``dec_cache[i]``  — one input frame per decoder deconv, which re-expresses
                      the lookahead as a one-frame DELAY per layer
                      (delay-line form: with the previous input frame
                      prepended and the transpose-conv output sliced
                      ``[1:-1]``, chunk outputs equal the offline frames
                      shifted one earlier — models/dccrn.py time_mode);
* ``skip_buf[i]``   — an ``i``-frame FIFO per decoder skip join, so the
                      encoder skip (undelayed) aligns with the decoder
                      trunk (delayed ``i`` frames by the layers below);
* ``spec_buf``      — the last ``n_layers`` input-spectrum frames, so the
                      mask (delayed ``n_layers`` frames) multiplies the
                      spectrum frame it was computed for;
* ``ola_tail``      — the incomplete ``win - hop`` samples of the inverse
                      overlap-add (ConviSTFT, src/model/dccrn.py:723-746).

Everything is fixed-shape, so one compiled step serves the whole stream.
Algorithmic latency = ``n_layers * hop + (win - hop)`` samples — 900
samples = 56.25 ms at 16 kHz for the reference config (6 layers, win 400,
hop 100). The first ``latency`` output samples of a stream are warmup
(leading ``n_layers * hop`` exactly zero, then ``win - hop`` of pre-output
window bleed); thereafter ``stream_out[latency + n] == offline_out[n]`` to
float tolerance (tests/test_streaming.py asserts this end-to-end).

Envelope normalization: offline ConviSTFT divides by the overlap-added
squared window. Because the offline path pads ``win - hop`` on BOTH sides,
every retained output sample has full ``win / hop``-window coverage, so the
envelope is exactly periodic with period ``hop`` — the stream divides by
that precomputed periodic envelope (requires ``win % hop == 0``, true for
the reference's 400/100).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.dccrn import (
    DCCRN,
    _ComplexConvBlock,
    _ComplexDeconvBlock,
    _split_parts,
    _stft_bases,
)
from speech_enhancement_tpu.ops.frame import frame_signal, overlap_add
from speech_enhancement_tpu.ops.rnn import ComplexLSTM


def _periodic_envelope(window: np.ndarray, hop: int) -> np.ndarray:
    """Steady-state squared-window overlap sum, one ``hop`` period."""
    win = window.shape[0]
    k = win // hop
    w2 = (window * window).reshape(k, hop)
    return w2.sum(axis=0).astype(np.float32)


class DCCRNStreamer:
    """Stateful chunked inference over a trained DCCRN.

    Parameters
    ----------
    model: the DCCRN module (``use_clstm=True``, ``layout="nhwc"``,
        ``win_len % win_inc == 0`` — the shipped flagship config).
    variables: trained variables (``params`` + ``batch_stats``), e.g. from a
        checkpoint or the torch importer.
    chunk_frames: STFT frames consumed per step. Chunk size in samples is
        ``chunk_frames * win_inc`` (default 16 frames = 1600 samples =
        100 ms at 16 kHz). Must be >= ``len(kernel_num)`` so every skip
        FIFO fits inside one chunk.
    """

    def __init__(self, model: DCCRN, variables: Dict[str, Any],
                 chunk_frames: int = 16):
        if not model.use_clstm:
            raise ValueError("DCCRNStreamer requires use_clstm=True")
        if model.layout != "nhwc":
            raise ValueError("DCCRNStreamer requires layout='nhwc'")
        if model.win_len % model.win_inc != 0:
            raise ValueError("win_len must be a multiple of win_inc")
        if chunk_frames < len(model.kernel_num):
            raise ValueError(
                f"chunk_frames must be >= n_layers ({len(model.kernel_num)})")
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.K = int(chunk_frames)
        self.hop = int(model.win_inc)
        self.win = int(model.win_len)
        self.pad = self.win - self.hop
        self.n_layers = len(model.kernel_num)
        #: stream output is delayed by this many samples: the first
        #: ``latency`` emitted samples are warmup (the leading
        #: ``n_layers * hop`` exactly zero, then ``win - hop`` samples of
        #: pre-output window bleed) — ``enhance()`` discards them.
        self.latency = self.n_layers * self.hop + self.pad
        #: samples consumed/emitted per step()
        self.chunk_samples = self.K * self.hop

        fwd, inv, window = _stft_bases(self.win, model.fft_len)
        self._fwd = jnp.asarray(fwd)       # [win, 2F]
        self._inv = jnp.asarray(inv)       # [2F, win]
        env = np.tile(_periodic_envelope(window, self.hop), self.K)
        self._env = jnp.asarray(env)       # [K * hop]

        # per-layer freq dims after the stride-2 freq convs (DC dropped)
        f = model.fft_len // 2
        self._enc_f = []
        for _ in model.kernel_num:
            self._enc_f.append(f)
            f = f // 2
        self._bottleneck_f = f

        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def init_state(self, batch: int) -> Dict[str, Any]:
        """Zero stream state for ``batch`` parallel streams."""
        m = self.model
        n_freq2 = 2 * (m.fft_len // 2 + 1)
        enc_cache = []
        dec_cache = []
        skip_buf = []
        c2in = 2
        for i, feats in enumerate(m.kernel_num):
            enc_cache.append(jnp.zeros((batch, self._enc_f[i], 1, c2in)))
            c2in = feats
        dec_channels = list(m.kernel_num[::-1][1:]) + [2]
        c2x = m.kernel_num[-1]
        # decoder layer i runs at the bottleneck freq * 2^i
        f = self._bottleneck_f
        for i, feats in enumerate(dec_channels):
            c2s = m.kernel_num[len(m.kernel_num) - 1 - i]
            dec_cache.append(jnp.zeros((batch, f, 1, c2x + c2s)))
            skip_buf.append(jnp.zeros((batch, f, i, c2s)))
            c2x = feats
            f = f * 2
        lstm = []
        h = m.rnn_units // 2
        for _ in range(m.rnn_layers):
            # distinct arrays per slot: step() donates the state, and XLA
            # rejects donating one buffer through two pytree leaves
            lstm.append(
                ((jnp.zeros((2 * batch, h)), jnp.zeros((2 * batch, h))),
                 (jnp.zeros((2 * batch, h)), jnp.zeros((2 * batch, h)))))
        return {
            "wav_tail": jnp.zeros((batch, self.pad)),
            "enc_cache": enc_cache,
            "lstm": lstm,
            "dec_cache": dec_cache,
            "skip_buf": skip_buf,
            "spec_buf": jnp.zeros((batch, n_freq2, self.n_layers)),
            "ola_tail": jnp.zeros((batch, self.pad)),
        }

    def step(self, state: Dict[str, Any], chunk: jnp.ndarray):
        """Consume ``chunk`` [B, chunk_samples]; emit the same number of
        enhanced samples, delayed by ``self.latency``."""
        return self._step(state, chunk)

    # ------------------------------------------------------------------
    def _step_impl(self, state, chunk):
        m = self.model
        K, hop, win = self.K, self.hop, self.win
        batch = chunk.shape[0]
        compute_dtype = jnp.dtype(m.dtype)
        new_state = {}

        # ---- ConvSTFT over [tail | chunk]: frames match offline indices
        x = jnp.concatenate([state["wav_tail"], chunk], axis=-1)
        new_state["wav_tail"] = x[:, -self.pad:]
        frames = frame_signal(x, win, hop)                      # [B, K, win]
        spec = jnp.matmul(frames, self._fwd,
                          preferred_element_type=jnp.float32)   # [B, K, 2F]
        spec = jnp.swapaxes(spec, 1, 2)                         # [B, 2F, K]
        n_freq = m.fft_len // 2 + 1
        real, imag = spec[:, :n_freq], spec[:, n_freq:]

        # ---- encoder (causal: cached previous frame replaces the time pad)
        x2 = jnp.stack([real[:, 1:, :], imag[:, 1:, :]], axis=-1)  # [B,F,K,2]
        new_enc = []
        skips = []
        for i, feats in enumerate(m.kernel_num):
            xin = jnp.concatenate([state["enc_cache"][i], x2], axis=2)
            new_enc.append(xin[:, :, -1:, :])
            blk = _ComplexConvBlock(
                feats // 2, m.kernel_size, dtype=compute_dtype,
                cbn_fold=m.cbn_fold, layout="nhwc", time_mode="stream")
            x2 = blk.apply(
                {"params": self.params[f"enc_{i}"],
                 "batch_stats": self.batch_stats.get(f"enc_{i}", {})},
                xin, False)
            skips.append(x2)
        new_state["enc_cache"] = new_enc

        # ---- complex LSTM bottleneck with carried state
        dims = self._bottleneck_f
        channels = m.kernel_num[-1] // 2
        xr, xi = _split_parts(x2, -1)
        r_in = xr.transpose(0, 2, 3, 1).reshape(batch, K, channels * dims)
        i_in = xi.transpose(0, 2, 3, 1).reshape(batch, K, channels * dims)
        new_lstm = []
        for idx in range(m.rnn_layers):
            last = idx == m.rnn_layers - 1
            mod = ComplexLSTM(
                hidden_size=m.rnn_units // 2,
                projection_dim=channels * dims if last else None,
                dtype=compute_dtype, return_state=True)
            (r_in, i_in), st = mod.apply(
                {"params": self.params[f"clstm_{idx}"]},
                r_in, i_in, init_state=state["lstm"][idx])
            new_lstm.append(st)
        new_state["lstm"] = new_lstm
        xr = r_in.reshape(batch, K, channels, dims).transpose(0, 3, 1, 2)
        xi = i_in.reshape(batch, K, channels, dims).transpose(0, 3, 1, 2)
        x2 = jnp.concatenate([xr, xi], axis=-1)

        # ---- decoder: delay-line deconvs + skip FIFOs
        dec_channels = list(m.kernel_num[::-1][1:]) + [2]
        new_dec = []
        new_skip = []
        for i, feats in enumerate(dec_channels):
            raw_skip = skips[len(skips) - 1 - i]
            if i == 0:
                skip_cur = raw_skip
                new_skip.append(state["skip_buf"][0])  # stays empty
            else:
                sb = jnp.concatenate([state["skip_buf"][i], raw_skip], axis=2)
                skip_cur = sb[:, :, :K, :]
                new_skip.append(sb[:, :, K:, :])
            xr, xi = _split_parts(x2, -1)
            sr, si = _split_parts(skip_cur, -1)
            joined = jnp.concatenate([xr, sr, xi, si], axis=-1)
            xin = jnp.concatenate([state["dec_cache"][i], joined], axis=2)
            new_dec.append(xin[:, :, -1:, :])
            blk = _ComplexDeconvBlock(
                feats // 2, m.kernel_size,
                last=(i == len(dec_channels) - 1), dtype=compute_dtype,
                cbn_fold=m.cbn_fold, layout="nhwc", time_mode="stream")
            x2 = blk.apply(
                {"params": self.params[f"dec_{i}"],
                 "batch_stats": self.batch_stats.get(f"dec_{i}", {})},
                xin, False)
        new_state["dec_cache"] = new_dec
        new_state["skip_buf"] = new_skip

        # ---- mask head (frames delayed n_layers vs the input spectrum)
        x2 = x2.astype(jnp.float32)
        xr, xi = _split_parts(x2, -1)
        mask_real = jnp.pad(xr[..., 0], ((0, 0), (1, 0), (0, 0)))
        mask_imag = jnp.pad(xi[..., 0], ((0, 0), (1, 0), (0, 0)))

        sb = jnp.concatenate([state["spec_buf"], spec], axis=-1)
        spec_del = sb[:, :, :K]
        new_state["spec_buf"] = sb[:, :, K:]
        real_d, imag_d = spec_del[:, :n_freq], spec_del[:, n_freq:]

        if m.masking_mode == "E":
            # trig-free identity — same as the offline head (models/dccrn.py)
            mags = jnp.sqrt(mask_real**2 + mask_imag**2 + 1e-12)
            scale = jnp.tanh(mags) / (mags + 1e-8)
            out_real = scale * (real_d * mask_real - imag_d * mask_imag)
            out_imag = scale * (real_d * mask_imag + imag_d * mask_real)
        elif m.masking_mode == "C":
            out_real = real_d * mask_real - imag_d * mask_imag
            out_imag = real_d * mask_imag + imag_d * mask_real
        elif m.masking_mode == "R":
            out_real = real_d * mask_real
            out_imag = imag_d * mask_imag
        else:
            raise ValueError(f"unknown masking_mode {m.masking_mode!r}")

        # ---- streaming ConviSTFT: OLA with carried tail, periodic envelope
        out_spec = jnp.concatenate([out_real, out_imag], axis=1)  # [B,2F,K]
        syn = jnp.matmul(jnp.swapaxes(out_spec, 1, 2), self._inv,
                         preferred_element_type=jnp.float32)      # [B,K,win]
        ola = overlap_add(syn, hop)              # [B, K*hop + pad]
        ola = ola.at[:, :self.pad].add(state["ola_tail"])
        new_state["ola_tail"] = ola[:, K * hop:]
        out = ola[:, :K * hop] / (self._env + 1e-8)
        out = jnp.clip(out, -1.0, 1.0)
        return new_state, out

    # ------------------------------------------------------------------
    def enhance(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Convenience: stream a whole [B, T] utterance chunk by chunk and
        return the latency-compensated enhanced signal [B, T].

        Matches the offline ``model.apply`` output to float tolerance on
        all but the FINAL ``latency`` samples: the offline forward's finite
        sequence makes every decoder layer see zero future *activations* at
        the boundary (the transpose-conv edge), whereas a real stream keeps
        running on zero-padded *input* whose frames are bias/LSTM-driven
        rather than zero. The divergence is confined to the last
        ``latency`` samples and small (tests/test_streaming.py pins both).
        """
        batch, length = wav.shape
        cs = self.chunk_samples
        total = length + self.latency
        n_chunks = -(-total // cs)
        padded = jnp.pad(wav, ((0, 0), (0, n_chunks * cs - length)))
        state = self.init_state(batch)
        outs = []
        for c in range(n_chunks):
            state, out = self.step(state, padded[:, c * cs:(c + 1) * cs])
            outs.append(out)
        full = jnp.concatenate(outs, axis=-1)
        return full[:, self.latency:self.latency + length]


class CRNStreamer:
    """Stateful chunked inference over a trained CRN (second streamable
    family, VERDICT r3 task 8).

    CRN is FULLY causal — conv encoder (time kernel 2, causal pad), two
    unidirectional LSTMs, transpose-conv decoder whose time chomp drops the
    trailing step (no lookahead, unlike DCCRN) — so the stream carries only:

    * ``wav_tail``   — the last ``n_fft - hop`` input samples (STFT framing
                       history);
    * ``enc_cache``  — one input frame per encoder conv (the causal pad);
    * ``lstm``       — the two LSTM (h, c) carries;
    * ``dec_cache``  — one input frame per decoder transpose conv;
    * ``ola_tail``   — the incomplete ``n_fft - hop`` samples of the
                       inverse overlap-add.

    The offline path uses center=True REFLECT-padded STFT
    (ops/stft.py:stft_custom), so exactness needs the stream head primed
    from the first chunk's actual samples: ``step()`` dispatches the FIRST
    chunk to a dedicated compiled step whose framing starts at offline
    frame 0 with the reflected head — after that every computed frame,
    LSTM state and emitted sample equals the offline forward bit-for-bit
    (up to fp tolerance), with NO warmup region: the first step simply
    emits ``win - hop`` fewer samples (the algorithmic latency, 24 ms at
    16 kHz for the shipped 512/128 config). Divergence is confined to the
    final ``win`` samples of a finished utterance, where offline sees the
    right reflect pad a stream never has (same contract as DCCRNStreamer).
    """

    def __init__(self, model, variables: Dict[str, Any],
                 chunk_frames: int = 16, n_fft: int = 512, hop: int = 128):
        from speech_enhancement_tpu.models.crn import (_CausalConvBlock,
                                                       _CausalTransConvBlock,
                                                       _ENC_CHANNELS)
        from speech_enhancement_tpu.ops.stft import _rfft_basis, hann_window

        if not model.use_lstm:
            raise ValueError("CRNStreamer requires use_lstm=True")
        if n_fft % hop != 0:
            raise ValueError("n_fft must be a multiple of hop (periodic "
                             "OLA envelope)")
        self.model = model
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self._conv_block = _CausalConvBlock
        self._tconv_block = _CausalTransConvBlock
        self._enc_channels = _ENC_CHANNELS

        # model-boundary STFT geometry (configs/crn_vbd.yaml; the model
        # itself is geometry-agnostic — evaluate.py applies stft_custom)
        self.n_fft = int(n_fft)
        self.hop = int(hop)
        self.win = int(n_fft)
        self.K = int(chunk_frames)
        self.pad = self.n_fft // 2                # center-pad (reflect head)
        self.tail = self.n_fft - self.hop         # framing history
        #: samples consumed per steady step; the FIRST step emits
        #: ``chunk_samples - latency`` samples, all later steps the full
        #: ``chunk_samples`` — outputs align to input sample 0 directly.
        self.chunk_samples = self.K * self.hop
        #: algorithmic latency in samples (= win - hop)
        self.latency = self.win - self.hop
        if self.chunk_samples <= self.latency + self.hop:
            raise ValueError("chunk_frames too small for the 512/128 STFT")

        window = np.asarray(hann_window(self.win, self.n_fft))
        br, bi = _rfft_basis(self.n_fft)
        # forward basis includes the model-boundary 1/win scale
        # (stft_custom); the inverse multiplies it back (istft_custom)
        fwd = np.concatenate([br, bi], axis=1) * window[:, None] / self.win
        n_freq = self.n_fft // 2 + 1
        scale = np.ones(n_freq, np.float32)
        scale[1:-1] = 2.0  # irfft: conjugate-symmetric bins count twice
        # irfft: x[n] = (1/N) sum_k scale_k (Re X_k cos - Im X_k sin);
        # _rfft_basis's bi is already -sin (the rfft imag convention), so
        # the imag inverse coefficient is +bi
        inv_r = (br * scale[None, :]).T * window[None, :] / self.n_fft
        inv_i = (bi * scale[None, :]).T * window[None, :] / self.n_fft
        inv = np.concatenate([inv_r, inv_i], axis=0) * self.win
        self._fwd = jnp.asarray(fwd.astype(np.float32))   # [win, 2F]
        self._inv = jnp.asarray(inv.astype(np.float32))   # [2F, win]

        # steady-state periodic OLA envelope, one chunk long
        env = np.tile(_periodic_envelope(window, self.hop), self.K)
        self._env = jnp.asarray(env)
        # FIRST-step envelope: the true (edge-deficient) window-square OLA
        # for emitted coords [0, chunk - latency)
        n_first = self.K - 1  # frames computed by the first step
        first_len = (n_first - 1) * self.hop + self.win
        full = np.zeros(first_len, np.float32)
        for t in range(n_first):
            full[t * self.hop: t * self.hop + self.win] += window * window
        emitted = self.chunk_samples - self.latency
        self._env_first = jnp.asarray(full[self.pad: self.pad + emitted])

        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._step_first = jax.jit(self._first_impl)

    # ------------------------------------------------------------------
    def init_state(self, batch: int) -> Dict[str, Any]:
        """Zero stream state for ``batch`` parallel streams. The dict's
        ``"fresh"`` key is a HOST-side flag consumed by ``step()`` to
        dispatch the first chunk to the priming step."""
        n_freq = self.n_fft // 2 + 1
        enc_cache = []
        f = n_freq
        c = 1
        for feats in self._enc_channels:
            enc_cache.append(jnp.zeros((batch, f, 1, c)))
            f = (f - 3) // 2 + 1
            c = feats
        dec_cache = []
        dec_channels = (128, 64, 32, 16, 1)
        cx = self._enc_channels[-1]
        for i, feats in enumerate(dec_channels):
            cs = self._enc_channels[len(self._enc_channels) - 1 - i]
            dec_cache.append(jnp.zeros((batch, f, 1, cx + cs)))
            f = (f - 1) * 2 + 3 + (1 if i == 3 else 0)
            cx = feats
        lstm = []
        for name in ("lstm1", "lstm2"):
            h = self.params[name]["w_hh"].shape[0]
            lstm.append((jnp.zeros((batch, h)), jnp.zeros((batch, h))))
        return {
            "wav_tail": jnp.zeros((batch, self.tail)),
            "enc_cache": enc_cache,
            "lstm": lstm,
            "dec_cache": dec_cache,
            "ola_tail": jnp.zeros((batch, self.tail)),
            "fresh": True,
        }

    def step(self, state: Dict[str, Any], chunk: jnp.ndarray):
        """Consume ``chunk`` [B, chunk_samples]; emit enhanced samples
        aligned to input sample 0 (the first call emits ``latency`` fewer
        samples)."""
        fresh = state.pop("fresh", False)
        if fresh:
            new_state, out = self._step_first(state, chunk)
        else:
            new_state, out = self._step(state, chunk)
        new_state["fresh"] = False
        return new_state, out

    # ------------------------------------------------------------------
    def _frames_to_net(self, x):
        """[B, T_samples] -> masked-model spectra + net input."""
        frames = frame_signal(x, self.win, self.hop)           # [B, T', win]
        spec = jnp.matmul(frames, self._fwd,
                          preferred_element_type=jnp.float32)  # [B, T', 2F]
        return spec

    def _net(self, state, spec, n_frames):
        """Run the CRN body over ``n_frames`` spectrum frames with carried
        state; returns (new_caches, masked spectra [B, T', 2F])."""
        from speech_enhancement_tpu.ops.rnn import LSTMLayer

        m = self.model
        compute_dtype = jnp.dtype(m.dtype)
        n_freq = self.n_fft // 2 + 1
        real = jnp.swapaxes(spec[..., :n_freq], 1, 2)   # [B, F, T']
        imag = jnp.swapaxes(spec[..., n_freq:], 1, 2)
        amplitude = jnp.sqrt(real ** 2 + imag ** 2 + 1e-8)
        h = amplitude[..., None]                        # [B, F, T', 1]

        new_enc = []
        skips = []
        for i, feats in enumerate(self._enc_channels):
            xin = jnp.concatenate([state["enc_cache"][i], h], axis=2)
            new_enc.append(xin[:, :, -1:, :])
            blk = self._conv_block(feats, dtype=compute_dtype,
                                   time_mode="stream")
            h = blk.apply(
                {"params": self.params[f"enc_{i + 1}"],
                 "batch_stats": self.batch_stats.get(f"enc_{i + 1}", {})},
                xin, False)
            skips.append(h)

        batch, nf, nt, nc = h.shape
        flat = h.transpose(0, 2, 3, 1).reshape(batch, nt, nc * nf)
        new_lstm = []
        for j, name in enumerate(("lstm1", "lstm2")):
            mod = LSTMLayer(nc * nf, dtype=compute_dtype,
                            unroll=m.lstm_unroll)
            flat, st = mod.apply({"params": self.params[name]}, flat,
                                 init_state=state["lstm"][j])
            new_lstm.append(st)
        mid = flat.reshape(batch, nt, nc, nf).transpose(0, 3, 1, 2)

        d = mid
        new_dec = []
        dec_channels = (128, 64, 32, 16, 1)
        for i, feats in enumerate(dec_channels):
            skip = skips[len(skips) - 1 - i]
            d = jnp.concatenate([d, skip], axis=-1)
            xin = jnp.concatenate([state["dec_cache"][i], d], axis=2)
            new_dec.append(xin[:, :, -1:, :])
            blk = self._tconv_block(
                feats, is_last=(i == len(dec_channels) - 1),
                extra_freq_pad=1 if i == 3 else 0, dtype=compute_dtype,
                time_mode="stream")
            d = blk.apply(
                {"params": self.params[f"dec_{i + 1}"],
                 "batch_stats": self.batch_stats.get(f"dec_{i + 1}", {})},
                xin, False)

        mask = d[..., 0].astype(jnp.float32)            # [B, F, T']
        out_real = jnp.swapaxes(mask * real, 1, 2)      # [B, T', F]
        out_imag = jnp.swapaxes(mask * imag, 1, 2)
        masked = jnp.concatenate([out_real, out_imag], axis=-1)
        caches = {"enc_cache": new_enc, "lstm": new_lstm,
                  "dec_cache": new_dec}
        return caches, masked

    def _synth(self, state, masked, n_frames, emit):
        """OLA synthesis with carried tail; emit ``emit`` final samples."""
        syn = jnp.matmul(masked, self._inv,
                         preferred_element_type=jnp.float32)  # [B, T', win]
        ola = overlap_add(syn, self.hop)     # [B, (T'-1)*hop + win]
        ola = ola.at[:, :self.tail].add(state["ola_tail"])
        tail = ola[:, emit:]
        return ola[:, :emit], tail

    def _first_impl(self, state, chunk):
        # reflect the head like offline center=True (stft_custom)
        head = chunk[:, 1:self.pad + 1][:, ::-1]
        x = jnp.concatenate([head, chunk], axis=-1)
        new_state = {"wav_tail": x[:, -self.tail:]}
        spec = self._frames_to_net(x)
        n_frames = self.K - 1
        caches, masked = self._net(state, spec, n_frames)
        new_state.update(caches)
        emit_raw = self.chunk_samples - self.latency + self.pad
        out, tail = self._synth(state, masked, n_frames, emit_raw)
        new_state["ola_tail"] = tail[:, :self.tail]
        out = out[:, self.pad:] / (self._env_first + 1e-8)
        return new_state, jnp.clip(out, -1.0, 1.0)

    def _step_impl(self, state, chunk):
        x = jnp.concatenate([state["wav_tail"], chunk], axis=-1)
        new_state = {"wav_tail": x[:, -self.tail:]}
        spec = self._frames_to_net(x)
        caches, masked = self._net(state, spec, self.K)
        new_state.update(caches)
        out, tail = self._synth(state, masked, self.K, self.chunk_samples)
        new_state["ola_tail"] = tail[:, :self.tail]
        out = out / (self._env + 1e-8)
        return new_state, jnp.clip(out, -1.0, 1.0)

    # ------------------------------------------------------------------
    def enhance(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Stream a whole [B, T] utterance chunk by chunk; returns [B, T]
        aligned to the offline forward (final ``win`` samples excepted —
        the right reflect pad a stream never has)."""
        batch, length = wav.shape
        cs = self.chunk_samples
        total = length + self.latency + cs
        n_chunks = -(-total // cs)
        padded = jnp.pad(wav, ((0, 0), (0, n_chunks * cs - length)))
        state = self.init_state(batch)
        outs = []
        for c in range(n_chunks):
            state, out = self.step(state, padded[:, c * cs:(c + 1) * cs])
            outs.append(out)
        full = jnp.concatenate(outs, axis=-1)
        return full[:, :length]
