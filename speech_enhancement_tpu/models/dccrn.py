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
        from speech_enhancement_tpu.ops.pallas.stft import stft_pallas

        interpret = jax.default_backend() != "tpu"
        spec = stft_pallas(x, fwd, win_inc, win_len, interpret=interpret)
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
        pad = ((2, 2), (1, 0))  # freq symmetric, time causal (dccrn.py:358-361)
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
        # torch: stride (2,1), padding (2,0), output_padding (1,0) in freq;
        # time grows by 1 and is chomped (out[..., 1:], dccrn.py:196).
        # VALID transpose gives (in-1)*2 + 5 freq rows; torch's padding=2 /
        # output_padding=1 crops 2 left and (2 - 1) right.
        if nchw:
            y2 = jax.lax.conv_transpose(
                x2, jnp.transpose(kernel, (3, 2, 0, 1)), (2, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            y2 = y2[:, :, 2:-1, 1:]
            y2 = y2 + b2.astype(y2.dtype)[:, None, None]
        else:
            y2 = jax.lax.conv_transpose(
                x2, kernel, (2, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y2 = y2[:, 2:-1, 1:, :]
            y2 = y2 + b2.astype(y2.dtype)
        y2 = checkpoint_name(y2, "conv_out")
        if self.last:
            return y2
        yr, yi = ComplexBatchNorm(name="cbn", fold=self.cbn_fold,
                                  channel_axis=ch_axis)(
            _split_parts(y2, ch_axis), use_running_average=not train
        )
        return _PReLU(name="prelu")(jnp.concatenate([yr, yi], axis=ch_axis))


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
    # fuse the mode-'E' mask application into one Pallas VPU pass on the
    # inference path (ops/pallas/masking.py); training keeps the autodiff
    # XLA composition. Default ON: measured +5% end-to-end inference
    # throughput together with the Pallas STFT (tools/bench_inference.py,
    # 12.5 -> 13.2 utt/s on 10 s audio, v5e); only active when the default
    # backend is TPU, so CPU inference never falls into interpret mode.
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
    # fused Pallas framing+basis-matmul front-end (inference path only —
    # Pallas kernels carry no VJP here; training keeps the matmul ConvSTFT).
    # Default ON on TPU (see use_pallas_mask note).
    use_pallas_stft: object = True
    # activation layout: "nhwc" (channels in lanes) or "nchw" (time in
    # lanes). Params are identical either way; see _ComplexConvBlock.
    layout: str = "nhwc"

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
        stft_method = "pallas" if (use_stft and not train) else "matmul"
        specs = conv_stft(wav, self.win_len, self.win_inc, self.fft_len,
                          method=stft_method)
        real = specs[:, :n_freq]
        imag = specs[:, n_freq:]
        # (the reference materializes spec_mags/spec_phase here,
        # dccrn.py:147-152; the trig-free mask head below needs neither)

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

        # decoder with complex-cat skips, mirrored channels. The block
        # kernel wants input channels ordered [all r, all i], so the skip
        # join is ONE 4-way concat of the (r, i) halves of both tensors —
        # not per-part concats on materialized halves.
        dec_channels = list(self.kernel_num[::-1][1:]) + [2]
        for idx, features in enumerate(dec_channels):
            skip2 = skips[len(skips) - 1 - idx]
            xr, xi = _split_parts(x2, ch_axis)
            skip_r, skip_i = _split_parts(skip2, ch_axis)
            x2 = jnp.concatenate([xr, skip_r, xi, skip_i], axis=ch_axis)
            x2 = dec_block(
                features // 2, self.kernel_size, last=(idx == len(dec_channels) - 1),
                dtype=compute_dtype, cbn_fold=self.cbn_fold, layout=self.layout,
                name=f"dec_{idx}",
            )(x2, train)

        # mask head and synthesis in float32 regardless of compute dtype
        x2 = x2.astype(jnp.float32)
        xr, xi = _split_parts(x2, ch_axis)
        mask_r2 = xr[:, 0] if nchw else xr[..., 0]  # [B, F-1, T]
        mask_i2 = xi[:, 0] if nchw else xi[..., 0]
        mask_real = jnp.pad(mask_r2, ((0, 0), (1, 0), (0, 0)))  # DC bin back
        mask_imag = jnp.pad(mask_i2, ((0, 0), (1, 0), (0, 0)))

        use_mask = self.use_pallas_mask and (
            jax.default_backend() == "tpu" or self.use_pallas_mask == "force"
        )
        if self.masking_mode == "E" and use_mask and not train:
            from speech_enhancement_tpu.ops.pallas.masking import apply_mask_e

            interpret = jax.default_backend() != "tpu"
            out_real, out_imag = apply_mask_e(real, imag, mask_real, mask_imag,
                                              interpret=interpret)
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
