"""DCCRN — deep complex conv-recurrent net on raw waveform (reference:
src/model/dccrn.py, 9.4 MB; Hu et al., Interspeech 2020). The framework's
flagship benchmark model (BASELINE.md north star).

Pipeline (reference dccrn.py:145-229):
  wav -> ConvSTFT (win 400 / hop 100 / fft 512, non-centered, Hann)
      -> drop DC bin, complex encoder x6 (ComplexConv2d k=(5,2) s=(2,1),
         causal time pad, complex BN, PReLU)
      -> complex LSTM x2 (hidden 64/part, final projection back)
      -> complex decoder x6 (ComplexConvTranspose2d, complex-cat skips,
         time chomp)
      -> mask head, masking modes:
         'E' tanh|M| x |X|, phase(X) + phase(M)   (the default)
         'C' complex multiply, 'R' independent real multiply
      -> ConviSTFT (pinv basis, window-envelope normalized) -> clamp(-1, 1)

TPU-first design:
  * ConvSTFT / ConviSTFT are framed *matmuls* against precomputed rFFT /
    pinv bases — [T', win] @ [win, 2F] on the MXU — instead of the
    reference's stride-100 conv1d (dccrn.py:687-701), with the overlap-add
    inverse built from the scatter-free chunked OLA in ops/frame.py;
  * complex convs run channels-last (NHWC) as paired real convs;
  * the complex LSTM is 4 hoisted-projection scans (ops/rnn.py).

Deviation from the reference (documented): ConviSTFT's output-length trim
uses the actual input length instead of the constructor's fixed
``length=16384`` (dccrn.py:740-744), which would truncate any utterance
longer than ~1 s — the reference never trained this path (its README/tests
mark DCCRN untested end-to-end).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from speech_enhancement_tpu.models.types import WAV_MONO, SignalSpec
from speech_enhancement_tpu.ops.complex_ops import ComplexBatchNorm
from speech_enhancement_tpu.ops.frame import frame_signal, overlap_add
from speech_enhancement_tpu.ops.rnn import ComplexLSTM


@lru_cache(maxsize=8)
def _stft_bases(win_len: int, fft_len: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(forward [win, 2F], inverse [2F, win], window [win]) — dccrn.py:649-666."""
    n = np.arange(win_len)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)  # periodic hann
    fourier = np.fft.rfft(np.eye(fft_len))[:win_len]  # [win, F]
    kernel = np.concatenate([np.real(fourier), np.imag(fourier)], axis=1).T  # [2F, win]
    inv = np.linalg.pinv(kernel).T  # [2F, win]
    fwd = (kernel * window).T.astype(np.float32)  # [win, 2F]
    inv = (inv * window).astype(np.float32)  # [2F, win]
    return fwd, inv, window.astype(np.float32)


def conv_stft(wav: jnp.ndarray, win_len: int, win_inc: int, fft_len: int,
              method: str = "matmul") -> jnp.ndarray:
    """[B, T] -> [B, 2F, T'] with the reference's both-sides (win-hop) pad.

    method="pallas" runs the fused framing+matmul kernel
    (ops/pallas/stft.py) instead of materializing the frame tensor.
    """
    pad = win_len - win_inc
    x = jnp.pad(wav, ((0, 0), (pad, pad)))
    fwd, _, _ = _stft_bases(win_len, fft_len)
    if method == "pallas" and win_len % win_inc == 0:
        from speech_enhancement_tpu.ops.pallas.stft import stft_pallas_diff

        interpret = jax.default_backend() != "tpu"
        # custom-VJP wrapper: the fused kernel runs fwd; the backward is
        # g @ basis^T overlap-added in XLA — usable under train too
        spec = stft_pallas_diff(x, fwd, win_inc, win_len, interpret)
    else:
        frames = frame_signal(x, win_len, win_inc)  # [B, T', win]
        spec = jnp.matmul(frames, jnp.asarray(fwd), preferred_element_type=jnp.float32)
    return jnp.swapaxes(spec, 1, 2)  # [B, 2F, T']


def conv_istft(
    spec: jnp.ndarray, win_len: int, win_inc: int, fft_len: int, length: int
) -> jnp.ndarray:
    """[B, 2F, T'] -> [B, length] via pinv basis + window-envelope division."""
    _, inv, window = _stft_bases(win_len, fft_len)
    frames = jnp.matmul(
        jnp.swapaxes(spec, 1, 2), jnp.asarray(inv), preferred_element_type=jnp.float32
    )  # [B, T', win]
    signal = overlap_add(frames, win_inc)
    n_frames = spec.shape[-1]
    env = overlap_add(
        jnp.broadcast_to(jnp.asarray(window * window), (n_frames, win_len)), win_inc
    )
    signal = signal / (env + 1e-8)
    pad = win_len - win_inc
    return signal[..., pad : pad + length]


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


def _block_complex_kernel(wr: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """[kh, kw, Cin, Cout] pair -> [kh, kw, 2Cin, 2Cout] block-matrix kernel.

    One real conv over channel-stacked (r, i) inputs computes the complex
    conv exactly: out_r = Wr*xr - Wi*xi, out_i = Wi*xr + Wr*xi. Same FLOPs
    as the 4-conv formulation, but 1 conv with 2x wider channels — better
    MXU/lane utilization on the small early layers, and the (rr - ii)
    combination fuses into the conv itself.
    """
    top = jnp.concatenate([wr, wi], axis=3)   # contributions from xr
    bot = jnp.concatenate([-wi, wr], axis=3)  # contributions from xi
    return jnp.concatenate([top, bot], axis=2)


def _split_parts(x2: jnp.ndarray, ch_axis: int):
    """Stacked [.., 2C, ..] activation -> (real, imag) halves (views)."""
    n = x2.shape[ch_axis] // 2
    if ch_axis == 1:
        return x2[:, :n], x2[:, n:]
    return x2[..., :n], x2[..., n:]


class _ComplexConvBlock(nn.Module):
    """ComplexConv2d(k=(5,2), s=(2,1), causal) + complex BN + PReLU.

    Activations flow through the model STACKED, [.., 2C] with the real-part
    channels first (the exact input/output order of the block-matrix
    kernel): blocks take and return one tensor, so XLA never materializes
    the per-part slice + re-concatenate pair at every block boundary that
    a (real, imag) tuple interface costs (measured ~15 ms/step of pure
    copies on the remat fast path, NOTES_DEV.md round-2 log).

    ``layout`` selects the activation layout: "nhwc" ([B, F, T, 2C],
    channels in lanes) or "nchw" ([B, 2C, F, T], TIME in lanes). Params are
    layout-independent (HWIO), so checkpoints and the torch importer work
    for both.
    """

    features: int  # per complex part
    kernel_size: int = 5
    dtype: object = None
    cbn_fold: bool = False
    layout: str = "nhwc"
    # "offline": causal time pad (1, 0) inside the conv (the training/batch
    # path). "stream": NO time pad — the streaming caller prepends the
    # cached previous frame itself (serve/streaming.py), so one chunk's
    # output frames are exactly the offline frames at those indices.
    time_mode: str = "offline"

    @nn.compact
    def __call__(self, x2, train: bool):
        nchw = self.layout == "nchw"
        ch_axis = 1 if nchw else -1
        in_ch = x2.shape[ch_axis] // 2
        kshape = (self.kernel_size, 2, in_ch, self.features)
        init = nn.initializers.lecun_normal()
        wr = self.param("wr", init, kshape)
        wi = self.param("wi", init, kshape)
        br = self.param("br", nn.initializers.zeros, (self.features,))
        bi = self.param("bi", nn.initializers.zeros, (self.features,))
        kernel = _block_complex_kernel(wr, wi)
        b2 = jnp.concatenate([br, bi])
        if self.dtype is not None:
            x2 = x2.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # freq symmetric, time causal (dccrn.py:358-361); stream mode gets
        # the previous frame prepended by the caller instead of a zero pad
        pad = ((2, 2), (1, 0) if self.time_mode == "offline" else (0, 0))
        if nchw:
            y2 = jax.lax.conv_general_dilated(
                x2, jnp.transpose(kernel, (3, 2, 0, 1)), (2, 1), pad,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            y2 = y2 + b2.astype(y2.dtype)[:, None, None]
        else:
            y2 = jax.lax.conv_general_dilated(
                x2, kernel, (2, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y2 = y2 + b2.astype(y2.dtype)
        y2 = checkpoint_name(y2, "conv_out")
        yr, yi = ComplexBatchNorm(name="cbn", fold=self.cbn_fold,
                                  channel_axis=ch_axis)(
            _split_parts(y2, ch_axis), use_running_average=not train
        )
        return _PReLU(name="prelu")(jnp.concatenate([yr, yi], axis=ch_axis))


class _ComplexDeconvBlock(nn.Module):
    features: int
    kernel_size: int = 5
    last: bool = False
    dtype: object = None
    cbn_fold: bool = False
    layout: str = "nhwc"
    # "offline": time slice [1:] after the VALID transpose (the reference's
    # chomp, dccrn.py:196 — a one-frame LOOKAHEAD per decoder layer).
    # "stream": the caller prepends the cached previous input frame, and the
    # slice becomes [1:-1] so the K output frames are exactly the offline
    # frames shifted one earlier (serve/streaming.py's delay-line form).
    time_mode: str = "offline"

    @nn.compact
    def __call__(self, x2, train: bool, skip2=None):
        """Complex deconv on x2 joined with an optional encoder skip.

        With ``skip2`` given, the reference's complex_cat skip join
        (dccrn.py:193-196, 304-314) is computed WITHOUT ever materializing
        the concatenated tensor: the deconv is linear in its input channels,
        so the kernel splits along its input-channel axis into the (trunk,
        skip) column groups and ``deconv(x2, K_x) + deconv(skip2, K_s)``
        equals the deconv of the concat exactly (up to fp reduction order).
        The concat temps ([B, D, T, 2C] per decoder layer, ~3 GB total at
        batch 128 in bf16) were the measured HBM-OOM binding constraint on
        the batch knee (NOTES_DEV.md round-3 OOM probes); params and
        checkpoints are identical either way — the kernel shape is keyed on
        the TOTAL input channels.

        Param-layout contract (matches the reference concat order
        [xr, skip_r, xi, skip_i]): per-part kernel columns [:Cx] multiply
        the trunk, [Cx:] the skip.
        """
        nchw = self.layout == "nchw"
        ch_axis = 1 if nchw else -1
        n_x = x2.shape[ch_axis] // 2
        n_s = 0 if skip2 is None else skip2.shape[ch_axis] // 2
        in_ch = n_x + n_s
        kshape = (self.kernel_size, 2, in_ch, self.features)
        init = nn.initializers.lecun_normal()
        wr = self.param("wr", init, kshape)
        wi = self.param("wi", init, kshape)
        br = self.param("br", nn.initializers.zeros, (self.features,))
        bi = self.param("bi", nn.initializers.zeros, (self.features,))
        b2 = jnp.concatenate([br, bi])
        if skip2 is None:
            kernels = [_block_complex_kernel(wr, wi)]
            inputs = [x2]
        else:
            kernels = [
                _block_complex_kernel(wr[:, :, :n_x], wi[:, :, :n_x]),
                _block_complex_kernel(wr[:, :, n_x:], wi[:, :, n_x:]),
            ]
            inputs = [x2, skip2]
        if self.dtype is not None:
            inputs = [x.astype(self.dtype) for x in inputs]
            kernels = [k.astype(self.dtype) for k in kernels]
        # torch: stride (2,1), padding (2,0), output_padding (1,0) in freq;
        # time grows by 1 and is chomped (out[..., 1:], dccrn.py:196).
        # VALID transpose gives (in-1)*2 + 5 freq rows; torch's padding=2 /
        # output_padding=1 crops 2 left and (2 - 1) right.
        t_sl = slice(1, None) if self.time_mode == "offline" else slice(1, -1)
        if nchw:
            y2 = sum(
                jax.lax.conv_transpose(
                    x, jnp.transpose(k, (3, 2, 0, 1)), (2, 1), "VALID",
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                for x, k in zip(inputs, kernels)
            )
            y2 = y2[:, :, 2:-1, t_sl]
            y2 = y2 + b2.astype(y2.dtype)[:, None, None]
        else:
            y2 = sum(
                jax.lax.conv_transpose(
                    x, k, (2, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                for x, k in zip(inputs, kernels)
            )
            y2 = y2[:, 2:-1, t_sl, :]
            y2 = y2 + b2.astype(y2.dtype)
        y2 = checkpoint_name(y2, "conv_out")
        if self.last:
            return y2
        yr, yi = ComplexBatchNorm(name="cbn", fold=self.cbn_fold,
                                  channel_axis=ch_axis)(
            _split_parts(y2, ch_axis), use_running_average=not train
        )
        return _PReLU(name="prelu")(jnp.concatenate([yr, yi], axis=ch_axis))


class _CBNState(nn.Module):
    """Parameter/stat holder mirroring ComplexBatchNorm's variable tree.

    The fused-block path (ops/pallas/experimental/conv_block.py) computes the CBN math
    inside its kernels; this module only declares the identical params +
    running stats (same names, shapes, initializers as
    ops/complex_ops.py:ComplexBatchNorm) so checkpoints and the torch
    importer work unchanged across ``use_fused_blocks``.
    """

    channels: int
    momentum: float = 0.9

    def setup(self):
        c = (self.channels,)
        rt2 = lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0))  # noqa: E731
        rt2v = lambda s: jnp.full(s, 1.0 / jnp.sqrt(2.0))  # noqa: E731
        self.gamma_rr = self.param("gamma_rr", rt2, c)
        self.gamma_ii = self.param("gamma_ii", rt2, c)
        self.gamma_ri = self.param("gamma_ri", nn.initializers.zeros, c)
        self.beta_r = self.param("beta_r", nn.initializers.zeros, c)
        self.beta_i = self.param("beta_i", nn.initializers.zeros, c)
        self.ra_mean_r = self.variable("batch_stats", "mean_r", jnp.zeros, c)
        self.ra_mean_i = self.variable("batch_stats", "mean_i", jnp.zeros, c)
        self.ra_vrr = self.variable("batch_stats", "vrr", rt2v, c)
        self.ra_vii = self.variable("batch_stats", "vii", rt2v, c)
        self.ra_vri = self.variable("batch_stats", "vri", jnp.zeros, c)

    def params_dict(self):
        return {"gamma_rr": self.gamma_rr, "gamma_ii": self.gamma_ii,
                "gamma_ri": self.gamma_ri, "beta_r": self.beta_r,
                "beta_i": self.beta_i}

    def running_stats(self):
        return {"mean_r": self.ra_mean_r.value, "mean_i": self.ra_mean_i.value,
                "vrr": self.ra_vrr.value, "vii": self.ra_vii.value,
                "vri": self.ra_vri.value}

    def update(self, stats):
        if self.is_initializing():
            return
        m = self.momentum
        self.ra_mean_r.value = m * self.ra_mean_r.value + (1 - m) * stats["mean_r"]
        self.ra_mean_i.value = m * self.ra_mean_i.value + (1 - m) * stats["mean_i"]
        self.ra_vrr.value = m * self.ra_vrr.value + (1 - m) * stats["vrr"]
        self.ra_vii.value = m * self.ra_vii.value + (1 - m) * stats["vii"]
        self.ra_vri.value = m * self.ra_vri.value + (1 - m) * stats["vri"]


class _AlphaParam(nn.Module):
    """PReLU scalar holder matching _PReLU's param ("alpha", (1,), 0.25)."""

    def setup(self):
        self.alpha = self.param("alpha", lambda k, s: jnp.full(s, 0.25), (1,))


class _FusedBlockParams(nn.Module):
    """Param tree twin of _ComplexConvBlock/_ComplexDeconvBlock for the
    fused-kernel execution path: same names ("wr"/"wi"/"br"/"bi" +
    "cbn"/"prelu" children), zero compute."""

    in_ch: int  # per complex part
    features: int  # per complex part
    kernel_size: int = 5
    last: bool = False

    def setup(self):
        kshape = (self.kernel_size, 2, self.in_ch, self.features)
        init = nn.initializers.lecun_normal()
        self.wr = self.param("wr", init, kshape)
        self.wi = self.param("wi", init, kshape)
        self.br = self.param("br", nn.initializers.zeros, (self.features,))
        self.bi = self.param("bi", nn.initializers.zeros, (self.features,))
        if not self.last:
            self.cbn = _CBNState(channels=self.features)
            self.prelu = _AlphaParam()

    def __call__(self):  # pragma: no cover - params are read directly
        return None


class DCCRN(nn.Module):
    SPEC: SignalSpec = WAV_MONO

    rnn_layers: int = 2
    rnn_units: int = 128
    win_len: int = 400
    win_inc: int = 100
    fft_len: int = 512
    masking_mode: str = "E"
    use_clstm: bool = True
    use_cbn: bool = True
    kernel_size: int = 5
    kernel_num: Tuple[int, ...] = (16, 32, 64, 128, 256, 256)
    # compute dtype for convs + LSTM ("bfloat16" keeps the MXU in bf16 with
    # f32 accumulation — the TPU-native fast path; params stay float32)
    dtype: str = "float32"
    # fuse the mode-'E' mask application into one Pallas VPU pass
    # (ops/pallas/masking.py). Default ON (True): TPU inference only —
    # measured +5% end-to-end inference throughput together with the
    # Pallas STFT (tools/bench_inference.py, 12.5 -> 13.2 utt/s on 10 s
    # audio, v5e); only active when the default backend is TPU, so CPU
    # inference never falls into interpret mode. "train" extends it to
    # train=True via the exact custom VJP (apply_mask_e_diff — backward
    # autodiffs the pole-free XLA identity; neutral-to-negative at the
    # bench operating points, same measurement as use_pallas_stft);
    # "force" = everywhere incl. non-TPU interpret mode (tests).
    use_pallas_mask: object = True
    # folded-coefficient ComplexBatchNorm (see ops/complex_ops.py): one-pass
    # f32 moment stats + per-channel fused multiply-add apply in the compute
    # dtype — the bf16 fast path
    cbn_fold: bool = False
    # rematerialize encoder/decoder blocks in the backward pass: trades
    # (cheap, VPU) recompute for HBM activation traffic
    remat: bool = False
    # named-saves policy for remat: comma-separated checkpoint_name tags to
    # SAVE instead of recompute (e.g. "conv_out,cbn_stats" keeps the conv
    # outputs + tiny per-channel CBN stat vectors, so the backward recompute
    # skips the convs and the big stat reductions). Empty = save nothing.
    remat_policy: str = ""
    # fused Pallas framing+basis-matmul front-end. The kernel carries an
    # exact custom VJP (stft_pallas_diff: backward = g @ basis^T overlap-
    # added in XLA), so it CAN serve training — but measured on v5e the
    # train step is neutral at batch 16 (244.5 vs 244.8 utt/s) and -2.5%
    # at batch 128 (416.2 vs 426.8): under remat the XLA frame tensor is
    # consumed by a fused matmul anyway, while the kernel's padded frame
    # blocks repeat on every recompute pass. So: True (default) = Pallas
    # for TPU *inference* only (+5% composed, RESULTS.md), train keeps the
    # matmul ConvSTFT; "train" = also under train=True (the VJP is exact,
    # tested in test_pallas.py); "force" = everywhere incl. non-TPU
    # interpret mode (hermetic tests). False = off.
    use_pallas_stft: object = True
    # activation layout: "nhwc" (channels in lanes) or "nchw" (time in
    # lanes). Params are identical either way; see _ComplexConvBlock.
    layout: str = "nhwc"
    # execute the encoder/decoder as fused Pallas block kernels
    # (ops/pallas/experimental/conv_block.py): activations flow as [B, F*C2, T] with time
    # in lanes, each block is one VMEM pass (pointwise of the previous
    # block's CBN+PReLU + complex conv), the decoder skip join never
    # materializes. Parameter tree is identical to the XLA path
    # (_FusedBlockParams twins). False | True (TPU only) | "force".
    use_fused_blocks: object = False

    def _fused_encoder_decoder(self, real, imag, train: bool,
                               interpret: bool):
        """Fused-kernel execution of the enc -> LSTM -> dec stack.

        Returns (mask_real, mask_imag) [B, F+1, T] with the DC bin padded
        back — the same contract as the XLA path below.
        """
        from speech_enhancement_tpu.ops.pallas.experimental import conv_block as cb

        compute_dtype = jnp.dtype(self.dtype)
        batch, _, n_time = real.shape
        f = self.fft_len // 2  # DC bin dropped
        x = jnp.stack([real[:, 1:], imag[:, 1:]], axis=2)  # [B, F, 2, T]
        x = x.reshape(batch, f * 2, n_time).astype(compute_dtype)

        coef = cb.identity_coeffs(2)
        alpha = jnp.ones((1,), jnp.float32)
        c2in = 2
        enc_outs = []  # (conv_out, f_out, c2out, out_coef, out_alpha)
        for idx, features in enumerate(self.kernel_num):
            blk = _FusedBlockParams(
                in_ch=c2in // 2, features=features // 2,
                kernel_size=self.kernel_size, name=f"enc_{idx}")
            w2 = _block_complex_kernel(blk.wr, blk.wi)
            b2 = jnp.concatenate([blk.br, blk.bi])
            if train:
                y, partials = cb.conv_block_train(
                    f, c2in, features, interpret, x, w2, b2, *coef, alpha)
                stats = cb.stats_from_partials(
                    partials, features, batch * (f // 2) * n_time)
                blk.cbn.update(stats)
            else:
                y = cb.fused_conv_block(
                    x, w2, b2, *coef, alpha, f_in=f, c2in=c2in,
                    c2out=features, with_stats=False, interpret=interpret)
                stats = blk.cbn.running_stats()
            coef = cb.fold_cbn_coeffs(blk.cbn.params_dict(), stats)
            alpha = blk.prelu.alpha
            x, f, c2in = y, f // 2, features
            enc_outs.append((y, f, c2in, coef, alpha))

        # ---- LSTM bottleneck (XLA; reuses the stacked-channel contract)
        channels = c2in // 2
        z5 = cb._pointwise_ref(
            x.reshape(batch, f, c2in, n_time), *coef, alpha)
        if self.use_clstm:
            # [B, F, C, T] -> [B, T, C*F] (C outer, F inner — the reference
            # flattening, dccrn.py:170-182)
            r_in = z5[:, :, :channels].transpose(0, 3, 2, 1).reshape(
                batch, n_time, channels * f)
            i_in = z5[:, :, channels:].transpose(0, 3, 2, 1).reshape(
                batch, n_time, channels * f)
            for idx in range(self.rnn_layers):
                last = idx == self.rnn_layers - 1
                r_in, i_in = ComplexLSTM(
                    hidden_size=self.rnn_units // 2,
                    projection_dim=channels * f if last else None,
                    dtype=compute_dtype,
                    name=f"clstm_{idx}",
                )(r_in, i_in)
            r = r_in.reshape(batch, n_time, channels, f).transpose(0, 3, 2, 1)
            i = i_in.reshape(batch, n_time, channels, f).transpose(0, 3, 2, 1)
            x = jnp.concatenate([r, i], axis=2)
        else:
            from speech_enhancement_tpu.ops.rnn import LSTMLayer

            flat = z5.transpose(0, 3, 2, 1).reshape(
                batch, n_time, c2in * f)
            for idx in range(self.rnn_layers):
                flat, _ = LSTMLayer(self.rnn_units, name=f"lstm_{idx}")(flat)
            flat = nn.Dense(c2in * f, name="transform")(flat)
            flat = jax.lax.optimization_barrier(flat)
            x = flat.reshape(batch, n_time, c2in, f).transpose(0, 3, 2, 1)
        x = x.reshape(batch, f * c2in, n_time).astype(compute_dtype)

        # ---- decoder: skip k joins enc_outs[-1-k]'s RAW conv output; the
        # kernel applies that block's pointwise in VMEM (equivalent to the
        # XLA path's post-activation skip tensor)
        xcoef = cb.identity_coeffs(c2in)  # LSTM output: no pending pointwise
        xalpha = jnp.ones((1,), jnp.float32)
        c2x = c2in
        dec_channels = list(self.kernel_num[::-1][1:]) + [2]
        for idx, features in enumerate(dec_channels):
            skip_y, f_s, c2s, scoef, salpha = enc_outs[len(enc_outs) - 1 - idx]
            last = idx == len(dec_channels) - 1
            blk = _FusedBlockParams(
                in_ch=(c2x + c2s) // 2, features=features // 2,
                kernel_size=self.kernel_size, last=last, name=f"dec_{idx}")
            w2 = _block_complex_kernel(blk.wr, blk.wi)
            b2 = jnp.concatenate([blk.br, blk.bi])
            if train:
                y, partials = cb.deconv_block_train(
                    f, c2x, c2s, features, interpret, x, skip_y, w2, b2,
                    *xcoef, xalpha, *scoef, salpha)
                if not last:
                    stats = cb.stats_from_partials(
                        partials, features, batch * (2 * f) * n_time)
                    blk.cbn.update(stats)
            else:
                y = cb.fused_deconv_block(
                    x, skip_y, w2, b2, xcoef, xalpha, scoef, salpha,
                    f_in=f, c2x=c2x, c2s=c2s, c2out=features,
                    with_stats=False, interpret=interpret)
                stats = None if last else blk.cbn.running_stats()
            if not last:
                xcoef = cb.fold_cbn_coeffs(blk.cbn.params_dict(), stats)
                xalpha = blk.prelu.alpha
            x, f, c2x = y, 2 * f, features

        y = x.astype(jnp.float32).reshape(batch, f, 2, n_time)
        mask_real = jnp.pad(y[:, :, 0], ((0, 0), (1, 0), (0, 0)))
        mask_imag = jnp.pad(y[:, :, 1], ((0, 0), (1, 0), (0, 0)))
        return mask_real, mask_imag

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # inputs: [B, C=1, T] or [B, T]
        squeeze_channel = inputs.ndim == 3
        wav = inputs[:, 0] if squeeze_channel else inputs
        length = wav.shape[-1]
        n_freq = self.fft_len // 2 + 1

        # flags: False | True (TPU only — CPU keeps the XLA path instead of
        # falling into interpret mode) | "force" (always, for hermetic tests).
        # The gate reads the DEFAULT backend at trace time: under an explicit
        # non-default placement on a TPU-enabled host (e.g. with
        # jax.default_device(cpu)) it still reports "tpu" and the Pallas
        # kernel would lower for CPU and fail — pass use_pallas_*=False for
        # that configuration (main.py's --device cpu does this via
        # JAX_PLATFORMS, which changes the default backend itself).
        on_tpu = jax.default_backend() == "tpu"
        use_stft = self.use_pallas_stft and (on_tpu or self.use_pallas_stft == "force")
        # train default stays matmul: measured -2.5% at batch 128 with the
        # Pallas fwd under remat (see use_pallas_stft note); opt in with
        # "train"/"force" — the custom VJP is exact either way.
        stft_train_ok = self.use_pallas_stft in ("train", "force")
        stft_method = "pallas" if (use_stft and (not train or stft_train_ok)) else "matmul"
        specs = conv_stft(wav, self.win_len, self.win_inc, self.fft_len,
                          method=stft_method)
        real = specs[:, :n_freq]
        imag = specs[:, n_freq:]
        # (the reference materializes spec_mags/spec_phase here,
        # dccrn.py:147-152; the trig-free mask head below needs neither)

        use_fused = self.use_fused_blocks and (
            on_tpu or self.use_fused_blocks == "force")
        if use_fused:
            mask_real, mask_imag = self._fused_encoder_decoder(
                real, imag, train, interpret=not on_tpu)
            return self._mask_and_synthesize(
                real, imag, mask_real, mask_imag, length, train,
                squeeze_channel)

        # drop DC bin; stacked activation (real-part channels, then imag):
        # layout "nhwc" [B, F-1, T', 2C] (channels in lanes) or "nchw"
        # [B, 2C, F-1, T'] (time in lanes)
        nchw = self.layout == "nchw"
        if nchw:
            x2 = jnp.stack([real[:, 1:, :], imag[:, 1:, :]], axis=1)
        else:
            x2 = jnp.stack([real[:, 1:, :], imag[:, 1:, :]], axis=-1)
        ch_axis = 1 if nchw else -1

        compute_dtype = jnp.dtype(self.dtype)
        enc_block = _ComplexConvBlock
        dec_block = _ComplexDeconvBlock
        if self.remat:
            # recompute block activations in the backward pass instead of
            # saving them (jax.checkpoint): the blocks are elementwise/HBM
            # bound, so recompute is cheaper than the saved-residual traffic
            kwargs = {}
            if self.remat_policy:
                kwargs["policy"] = jax.checkpoint_policies.save_only_these_names(
                    *self.remat_policy.split(",")
                )
            enc_block = nn.remat(enc_block, static_argnums=(2,), **kwargs)
            dec_block = nn.remat(dec_block, static_argnums=(2,), **kwargs)
        skips = []
        for idx, features in enumerate(self.kernel_num):
            x2 = enc_block(
                features // 2, self.kernel_size, dtype=compute_dtype,
                cbn_fold=self.cbn_fold, layout=self.layout, name=f"enc_{idx}"
            )(x2, train)
            skips.append(x2)

        if nchw:
            batch, channels2, dims, frames = x2.shape
        else:
            batch, dims, frames, channels2 = x2.shape
        channels = channels2 // 2  # per complex part
        if self.use_clstm:
            xr, xi = _split_parts(x2, ch_axis)
            if nchw:
                # [B, C, D, T] -> [B, T, C*D] (C outer, D inner — the
                # reference flattening order, dccrn.py:170-182)
                r_in = xr.transpose(0, 3, 1, 2).reshape(batch, frames, channels * dims)
                i_in = xi.transpose(0, 3, 1, 2).reshape(batch, frames, channels * dims)
            else:
                r_in = xr.transpose(0, 2, 3, 1).reshape(batch, frames, channels * dims)
                i_in = xi.transpose(0, 2, 3, 1).reshape(batch, frames, channels * dims)
            for idx in range(self.rnn_layers):
                last = idx == self.rnn_layers - 1
                r_in, i_in = ComplexLSTM(
                    hidden_size=self.rnn_units // 2,
                    projection_dim=channels * dims if last else None,
                    dtype=compute_dtype,
                    name=f"clstm_{idx}",
                )(r_in, i_in)
            if nchw:
                xr = r_in.reshape(batch, frames, channels, dims).transpose(0, 2, 3, 1)
                xi = i_in.reshape(batch, frames, channels, dims).transpose(0, 2, 3, 1)
            else:
                xr = r_in.reshape(batch, frames, channels, dims).transpose(0, 3, 1, 2)
                xi = i_in.reshape(batch, frames, channels, dims).transpose(0, 3, 1, 2)
            x2 = jnp.concatenate([xr, xi], axis=ch_axis)
        else:
            from speech_enhancement_tpu.ops.rnn import LSTMLayer

            # [B, T, 2C*D] with (2C outer, D inner) flattening, stacked
            # channel order [r..., i...] — same contract as the clstm path
            if nchw:
                flat = x2.transpose(0, 3, 1, 2)  # [B,2C,D,T] -> [B,T,2C,D]
            else:
                flat = x2.transpose(0, 2, 3, 1)  # [B,D,T,2C] -> [B,T,2C,D]
            flat = flat.reshape(batch, frames, 2 * channels * dims)
            for idx in range(self.rnn_layers):
                flat, _ = LSTMLayer(self.rnn_units, name=f"lstm_{idx}")(flat)
            flat = nn.Dense(2 * channels * dims, name="transform")(flat)
            # same XLA TPU wgrad/transpose-folding miscompile workaround as
            # ComplexLSTM's projection (ops/rnn.py): barrier between the
            # Dense and the layout shuffle below
            flat = jax.lax.optimization_barrier(flat)
            flat = flat.reshape(batch, frames, 2 * channels, dims)
            if nchw:
                x2 = flat.transpose(0, 2, 3, 1)  # -> [B,2C,D,T]
            else:
                x2 = flat.transpose(0, 3, 1, 2)  # -> [B,D,T,2C]

        # decoder with complex-cat skips, mirrored channels. The skip join
        # is computed by the block itself as split-weight deconvs
        # (deconv(trunk) + deconv(skip), see _ComplexDeconvBlock) — the
        # reference's concatenated tensor (dccrn.py:193-196) never exists,
        # which at batch 128 removes ~3 GB of bf16 decoder-input residuals
        # (the round-3 OOM-probe binding constraint on the batch knee).
        dec_channels = list(self.kernel_num[::-1][1:]) + [2]
        for idx, features in enumerate(dec_channels):
            skip2 = skips[len(skips) - 1 - idx]
            x2 = dec_block(
                features // 2, self.kernel_size, last=(idx == len(dec_channels) - 1),
                dtype=compute_dtype, cbn_fold=self.cbn_fold, layout=self.layout,
                name=f"dec_{idx}",
            )(x2, train, skip2)

        # mask head and synthesis in float32 regardless of compute dtype
        x2 = x2.astype(jnp.float32)
        xr, xi = _split_parts(x2, ch_axis)
        mask_r2 = xr[:, 0] if nchw else xr[..., 0]  # [B, F-1, T]
        mask_i2 = xi[:, 0] if nchw else xi[..., 0]
        mask_real = jnp.pad(mask_r2, ((0, 0), (1, 0), (0, 0)))  # DC bin back
        mask_imag = jnp.pad(mask_i2, ((0, 0), (1, 0), (0, 0)))
        return self._mask_and_synthesize(
            real, imag, mask_real, mask_imag, length, train, squeeze_channel)

    def _mask_and_synthesize(self, real, imag, mask_real, mask_imag, length,
                             train, squeeze_channel):
        """Masking modes E/C/R + ConviSTFT + clamp (dccrn.py:203-229)."""
        use_mask = self.use_pallas_mask and (
            jax.default_backend() == "tpu" or self.use_pallas_mask == "force"
        )
        mask_train_ok = self.use_pallas_mask in ("train", "force")
        if self.masking_mode == "E" and use_mask and (not train or mask_train_ok):
            from speech_enhancement_tpu.ops.pallas.masking import apply_mask_e_diff

            interpret = jax.default_backend() != "tpu"
            # fused kernel fwd + pole-free XLA backward (custom VJP), so the
            # kernel also serves the training path
            out_real, out_imag = apply_mask_e_diff(real, imag, mask_real,
                                                   mask_imag, interpret)
        elif self.masking_mode == "E":
            # Trig-free identity for tanh(|M|)*|X| at phase(X)+phase(M)
            # (reference dccrn.py:203-217 computes it via arctan2/cos/sin):
            #   out = tanh(|M|) / (|M| + eps) * (X * M)      (complex mult)
            # Same math to fp rounding, but pole-free: the reference
            # composition has NaN GRADIENTS at M == 0 (d sqrt at 0, and
            # arctan2 at the origin) — reachable in bf16 training, observed
            # as a mid-run NaN on TPU (NOTES_DEV.md round-2 log). The same
            # identity backs the Pallas mask kernel (ops/pallas/masking.py).
            mask_mags_raw = jnp.sqrt(mask_real**2 + mask_imag**2 + 1e-12)
            scale = jnp.tanh(mask_mags_raw) / (mask_mags_raw + 1e-8)
            out_real = scale * (real * mask_real - imag * mask_imag)
            out_imag = scale * (real * mask_imag + imag * mask_real)
        elif self.masking_mode == "C":
            out_real = real * mask_real - imag * mask_imag
            out_imag = real * mask_imag + imag * mask_real
        elif self.masking_mode == "R":
            out_real = real * mask_real
            out_imag = imag * mask_imag
        else:
            raise ValueError(f"unknown masking_mode {self.masking_mode!r}")

        out_spec = jnp.concatenate([out_real, out_imag], axis=1)
        out_wav = conv_istft(out_spec, self.win_len, self.win_inc, self.fft_len, length)
        out_wav = jnp.clip(out_wav, -1.0, 1.0)
        return out_wav[:, None, :] if squeeze_channel else out_wav
