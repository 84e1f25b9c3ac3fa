"""DCUnet — deep complex U-Net (reference: src/model/dcunet.py, 7.5 MB).

Complex-valued encoder/decoder U-Net over the spectrogram with DCCRN-style
masking modes (E/C/R). Depth-10 and depth-20 channel/kernel/stride tables
follow the reference (dcunet.py:165-307). The spatial orientation inside the
net is (time, freq) — the reference transposes on entry (dcunet.py:108).

``data_type=True`` (the configured default) is the complex path; complex
convs/BN are the shared paired-real modules (ops/complex_ops.py),
channels-last NHWC. With ``data_type=False`` the reference's real path is
shape-inconsistent (its mask indexing treats the freq axis as real/imag,
dcunet.py:130-141); here the real path produces a magnitude mask applied to
both parts — a working equivalent, documented deviation.

Decoder outputs are crop/padded back to the encoder's (T, F) so arbitrary
frame counts work (the reference only runs at its demo geometry).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import STFT_MONO, SignalSpec
from speech_enhancement_tpu.ops.complex_ops import ComplexBatchNormSimple


def _tables(complexity: int, depth: int, audio_channels: int):
    """Channel/kernel/stride/padding tables (reference dcunet.py:165-307)."""
    c = complexity
    if depth == 10:
        enc_ch = [audio_channels, c, c * 2, c * 2, c * 2, c * 2]
        enc_k = [(7, 5), (7, 5), (5, 3), (5, 3), (5, 3)]
        enc_s = [(2, 2), (2, 2), (2, 2), (2, 2), (2, 1)]
        enc_p = [(2, 1), None, None, None, None]
        dec_ch = [0, c * 2, c * 2, c * 2, c * 2, c * 2]
        dec_k = [(4, 3), (4, 4), (6, 4), (6, 4), (7, 5)]
        dec_s = [(2, 1), (2, 2), (2, 2), (2, 2), (2, 2)]
        dec_p = [(1, 1), (1, 1), (2, 1), (2, 1), (2, 1)]
    elif depth == 20:
        enc_ch = [audio_channels, c, c, c * 2, c * 2, c * 2, c * 2, c * 2, c * 2, c * 2, 128]
        enc_k = [(7, 1), (1, 7), (6, 4), (7, 5), (5, 3), (5, 3), (5, 3), (5, 3), (5, 3), (5, 3)]
        enc_s = [(1, 1), (1, 1), (2, 2), (2, 1), (2, 2), (2, 1), (2, 2), (2, 1), (2, 2), (2, 1)]
        enc_p = [(3, 0), (0, 3)] + [None] * 8
        dec_ch = [0] + [c * 2] * 11
        dec_k = [(4, 3), (4, 2), (4, 3), (4, 2), (4, 3), (4, 2), (6, 3), (7, 5), (1, 7), (7, 1)]
        dec_s = [(2, 1), (2, 2), (2, 1), (2, 2), (2, 1), (2, 2), (2, 1), (2, 2), (1, 1), (1, 1)]
        dec_p = [(1, 1), (1, 0), (1, 1), (1, 0), (1, 1), (1, 0), (2, 1), (2, 1), (0, 3), (3, 0)]
    else:
        raise ValueError(f"unknown model depth {depth}")
    enc_p = [p if p is not None else tuple((k - 1) // 2 for k in ks)
             for p, ks in zip(enc_p, enc_k)]
    return enc_ch, enc_k, enc_s, enc_p, dec_ch, dec_k, dec_s, dec_p


class _Pair:
    """Helper treating (real, imag) pairs uniformly for real/complex paths."""

    @staticmethod
    def conv(features, kernel, stride, pad, name, dtype=None):
        conv_r = nn.Conv(features, kernel, stride, [(pad[0], pad[0]), (pad[1], pad[1])],
                         dtype=dtype, name=f"{name}_r")
        conv_i = nn.Conv(features, kernel, stride, [(pad[0], pad[0]), (pad[1], pad[1])],
                         dtype=dtype, name=f"{name}_i")
        return conv_r, conv_i


class _ComplexEncoderBlock(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    pad: Tuple[int, int]
    dtype: object = None  # conv/activation compute dtype; BN stats stay f32

    @nn.compact
    def __call__(self, x, train: bool):
        xr, xi = x
        if self.dtype is not None:
            xr, xi = xr.astype(self.dtype), xi.astype(self.dtype)
        conv_r, conv_i = _Pair.conv(self.features, self.kernel, self.stride,
                                    self.pad, "conv", dtype=self.dtype)
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_r(xi) + conv_i(xr)
        yr, yi = ComplexBatchNormSimple(name="bn")((yr, yi), use_running_average=not train)
        yr, yi = nn.leaky_relu(yr, 0.01), nn.leaky_relu(yi, 0.01)
        if self.dtype is not None:
            yr, yi = yr.astype(self.dtype), yi.astype(self.dtype)
        return yr, yi


class _ComplexDecoderBlock(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    pad: Tuple[int, int]
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool):
        xr, xi = x
        if self.dtype is not None:
            xr, xi = xr.astype(self.dtype), xi.astype(self.dtype)
        tconv_r = nn.ConvTranspose(self.features, self.kernel, self.stride,
                                   "VALID", dtype=self.dtype, name="tconv_r")
        tconv_i = nn.ConvTranspose(self.features, self.kernel, self.stride,
                                   "VALID", dtype=self.dtype, name="tconv_i")

        def crop(y):
            p0, p1 = self.pad
            return y[:, p0 : y.shape[1] - p0 or None, p1 : y.shape[2] - p1 or None, :]

        yr = crop(tconv_r(xr) - tconv_i(xi))
        yi = crop(tconv_r(xi) + tconv_i(xr))
        yr, yi = ComplexBatchNormSimple(name="bn")((yr, yi), use_running_average=not train)
        yr, yi = nn.leaky_relu(yr, 0.01), nn.leaky_relu(yi, 0.01)
        if self.dtype is not None:
            yr, yi = yr.astype(self.dtype), yi.astype(self.dtype)
        return yr, yi


def _fit(x: jnp.ndarray, t: int, f: int) -> jnp.ndarray:
    """Crop/zero-pad [B, T, F, C] spatial dims to exactly (t, f)."""
    x = x[:, :t, :f, :]
    pad_t = t - x.shape[1]
    pad_f = f - x.shape[2]
    if pad_t or pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)))
    return x


class DCUnet(nn.Module):
    SPEC: SignalSpec = STFT_MONO

    audio_channels: int = 1
    data_type: bool = True  # True = complex network
    model_complexity: int = 45
    model_depth: int = 10
    padding_mode: str = "zeros"
    masking_mode: str = "E"
    # conv/activation compute dtype ("bfloat16" = TPU fast path); params,
    # BatchNorm stats and the mask head stay f32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, C, F, T, 2]
        real = x[..., 0]
        imag = x[..., 1]
        complexity = self.model_complexity
        if self.data_type:
            complexity = int(complexity // 1.414)
        enc_ch, enc_k, enc_s, enc_p, dec_ch, dec_k, dec_s, dec_p = _tables(
            complexity, self.model_depth, self.audio_channels
        )
        model_length = self.model_depth // 2

        # [B, C, F, T] -> NHWC over (T, F)
        if self.data_type:
            hr = real.transpose(0, 3, 2, 1)
            hi = imag.transpose(0, 3, 2, 1)
        else:
            amp = jnp.abs(real**2 - imag**2)  # reference Amplitude quirk
            hr = amp.transpose(0, 3, 2, 1)
            hi = jnp.zeros_like(hr)
        in_t, in_f = hr.shape[1], hr.shape[2]

        skips = []
        h = (hr, hi)
        for i in range(model_length):
            skips.append(h)
            h = _ComplexEncoderBlock(
                enc_ch[i + 1], enc_k[i], enc_s[i], enc_p[i],
                dtype=None if self.dtype == "float32" else jnp.dtype(self.dtype),
                name=f"enc_{i}",
            )(h, train)

        for i in range(model_length):
            h = _ComplexDecoderBlock(
                dec_ch[i + 1], dec_k[i], dec_s[i], dec_p[i],
                dtype=None if self.dtype == "float32" else jnp.dtype(self.dtype),
                name=f"dec_{i}",
            )(h, train)
            if i == model_length - 1:
                break
            skip_r, skip_i = skips[model_length - 1 - i]
            h = (
                jnp.concatenate([_fit(h[0], skip_r.shape[1], skip_r.shape[2]), skip_r], -1),
                jnp.concatenate([_fit(h[1], skip_i.shape[1], skip_i.shape[2]), skip_i], -1),
            )

        h = (_fit(h[0], in_t, in_f), _fit(h[1], in_t, in_f))
        lin_r = nn.Conv(1, (1, 1), name="linear_r")
        lin_i = nn.Conv(1, (1, 1), name="linear_i")
        # mask head in f32 regardless of compute dtype
        h = (h[0].astype(jnp.float32), h[1].astype(jnp.float32))
        mask_r = jnp.tanh(lin_r(h[0]) - lin_i(h[1]))
        mask_i = jnp.tanh(lin_r(h[1]) + lin_i(h[0]))
        # back to [B, 1, F, T], broadcast over input channels
        mask_r = mask_r.transpose(0, 3, 2, 1)
        mask_i = mask_i.transpose(0, 3, 2, 1)

        if not self.data_type:
            # working real-mask variant (see module docstring)
            out_r = real * mask_r
            out_i = imag * mask_r
            return jnp.stack([out_r, out_i], axis=-1)

        x_mag = jnp.sqrt(real**2 + imag**2 + 1e-8)
        x_phase = jnp.arctan2(imag, real)
        if self.masking_mode == "E":
            mask_mags_raw = jnp.sqrt(mask_r**2 + mask_i**2)
            mask_phase = jnp.arctan2(
                mask_i / (mask_mags_raw + 1e-8), mask_r / (mask_mags_raw + 1e-8)
            )
            est_mags = jnp.tanh(mask_mags_raw) * x_mag
            est_phase = x_phase + mask_phase
            out_r = est_mags * jnp.cos(est_phase)
            out_i = est_mags * jnp.sin(est_phase)
        elif self.masking_mode == "C":
            out_r = real * mask_r - imag * mask_i
            out_i = real * mask_i + imag * mask_r
        elif self.masking_mode == "R":
            out_r = real * mask_r
            out_i = imag * mask_i
        else:
            raise ValueError(f"unknown masking_mode {self.masking_mode!r}")
        return jnp.stack([out_r, out_i], axis=-1)
