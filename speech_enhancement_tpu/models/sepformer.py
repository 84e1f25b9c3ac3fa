"""Sepformer — dual-path transformer separation (reference:
src/model/sepformer/, 2,647 LoC; Subakan et al. 2021, arXiv:2010.13154).

Encoder (Conv1d k=16 s=8 + ReLU, sepformer.py:187-244) -> dual-path mask
net: half-overlap chunking into K-length segments (sepformer.py:455-521),
``masknet_numlayers`` x Dual_Computation_Block (intra-chunk transformer +
inter-chunk transformer with norms and skips, sepformer.py:656-787), PReLU,
speaker expansion conv, overlap-add inverse (sepformer.py:522-555), gated
output (tanh x sigmoid), ReLU masks -> linear ConvTranspose decoder
(sepformer.py:247-294).

Transformers are pre-norm MHA + FFN with sinusoidal positional encodings
(Transformer.py:24-311), built on flax MultiHeadDotProductAttention.

Engine-contract deviation (documented): the reference returns [B, T, spks]
and is never registered/trained there (distrib.py:227-238; only
forward-tested). Here the output is the framework's multi-speaker wav
contract [B, S, C, T] so Sepformer is trainable in the same Solver.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.types import WAV_MULTI, SignalSpec
from speech_enhancement_tpu.ops.norms import GlobalLayerNorm


def sinusoidal_positions(length: int, d_model: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    out = np.zeros((length, d_model), np.float32)
    out[:, 0::2] = np.sin(pos * div)
    out[:, 1::2] = np.cos(pos * div[: (d_model + 1) // 2])
    return out


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm MHA + positionwise FFN (reference Transformer.py:24-264)."""

    d_model: int
    nhead: int
    d_ffn: int
    norm_before: bool = True
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="mha"
        )
        ln1 = nn.LayerNorm(name="ln1")
        ln2 = nn.LayerNorm(name="ln2")
        if self.norm_before:
            h = ln1(x)
            x = x + attn(h, h)
            h = ln2(x)
            h = nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn1")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(h)
            return x + h
        h = attn(x, x)
        x = ln1(x + h)
        h = nn.gelu(nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn1")(x))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(h)
        return ln2(x + h)


class SBTransformerBlock(nn.Module):
    """Transformer encoder stack with optional sinusoidal positions
    (reference sepformer.py:558-654)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    use_positional_encoding: bool = True
    norm_before: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.use_positional_encoding:
            pos = jnp.asarray(sinusoidal_positions(x.shape[1], self.d_model))
            x = x + pos[None].astype(x.dtype)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.d_ffn, self.norm_before,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, train=train)
        return x


def _segment(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, int]:
    """[B, L, N] -> half-overlapping chunks [B, S, K, N] (sepformer.py:455-521)."""
    batch, length, features = x.shape
    p = k // 2
    gap = k - (p + length % k) % k
    if gap > 0:
        x = jnp.pad(x, ((0, 0), (0, gap), (0, 0)))
    x = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    first = x[:, :-p].reshape(batch, -1, k, features)
    second = x[:, p:].reshape(batch, -1, k, features)
    chunks = jnp.stack([first, second], axis=2).reshape(batch, -1, k, features)
    return chunks, gap


def _over_add(x: jnp.ndarray, gap: int) -> jnp.ndarray:
    """Inverse of :func:`_segment`: [B, S, K, N] -> [B, L, N]."""
    batch, n_chunks, k, features = x.shape
    p = k // 2
    x = x.reshape(batch, n_chunks // 2, 2 * k, features)
    first = x[:, :, :k].reshape(batch, -1, features)[:, p:]
    second = x[:, :, k:].reshape(batch, -1, features)[:, :-p]
    out = first + second
    if gap > 0:
        out = out[:, :-gap]
    return out


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key, s: jnp.full(s, 0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class DualComputationBlock(nn.Module):
    """Intra-chunk then inter-chunk processing with norms + skips
    (reference sepformer.py:656-787)."""

    d_model: int
    intra_layers: int
    inter_layers: int
    nhead: int
    d_ffn: int
    skip_around_intra: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, S, K, N]
        batch, n_chunks, k, features = x.shape
        intra = x.reshape(batch * n_chunks, k, features)
        intra = SBTransformerBlock(
            self.intra_layers, self.d_model, self.nhead, self.d_ffn,
            dtype=self.dtype, name="intra"
        )(intra, train=train)
        intra = intra.reshape(batch, n_chunks, k, features)
        intra = GlobalLayerNorm(name="intra_norm")(intra)
        if self.skip_around_intra:
            intra = intra + x

        inter = intra.transpose(0, 2, 1, 3).reshape(batch * k, n_chunks, features)
        inter = SBTransformerBlock(
            self.inter_layers, self.d_model, self.nhead, self.d_ffn,
            dtype=self.dtype, name="inter"
        )(inter, train=train)
        inter = inter.reshape(batch, k, n_chunks, features).transpose(0, 2, 1, 3)
        inter = GlobalLayerNorm(name="inter_norm")(inter)
        return inter + intra


class Sepformer(nn.Module):
    SPEC: SignalSpec = WAV_MULTI

    encoder_kernel_size: int = 16
    encoder_in_nchannels: int = 1
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 250
    masknet_numlayers: int = 2
    masknet_numspks: int = 2
    masknet_extraskipconnection: bool = True
    intra_numlayers: int = 8
    inter_numlayers: int = 8
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    # compute dtype for attention/FFN/convs ("bfloat16" = TPU fast path)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, mix: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mix: [B, C, T] -> [B, S, C, T]
        batch = mix.shape[0]
        t_origin = mix.shape[-1]
        n_spk = self.masknet_numspks
        stride = self.encoder_kernel_size // 2
        d_model = self.encoder_out_nchannels

        compute_dtype = jnp.dtype(self.dtype)
        # ---- encoder: [B, L, N]
        x = jnp.swapaxes(mix, 1, 2).astype(compute_dtype)
        mix_w = nn.relu(
            nn.Conv(d_model, (self.encoder_kernel_size,), strides=(stride,),
                    padding="VALID", use_bias=False, dtype=compute_dtype,
                    name="encoder")(x)
        )

        # ---- mask net (Dual_Path_Model, sepformer.py:296-455)
        h = GlobalLayerNorm(name="input_norm")(mix_w)
        h = nn.Dense(d_model, use_bias=False, dtype=compute_dtype,
                     name="input_proj")(h)
        h, gap = _segment(h, self.masknet_chunksize)
        for i in range(self.masknet_numlayers):
            h = DualComputationBlock(
                d_model, self.intra_numlayers, self.inter_numlayers,
                self.intra_nhead, self.intra_dffn,
                skip_around_intra=self.masknet_extraskipconnection,
                dtype=compute_dtype, name=f"dual_{i}",
            )(h, train=train)
        h = _PReLU(name="prelu")(h)
        h = nn.Dense(d_model * n_spk, dtype=compute_dtype,
                     name="spk_expand")(h)  # [B, S, K, N*spks]
        b, s_chunks, k, _ = h.shape
        h = h.reshape(b, s_chunks, k, n_spk, d_model)
        h = h.transpose(0, 3, 1, 2, 4).reshape(b * n_spk, s_chunks, k, d_model)
        h = _over_add(h, gap)  # [B*spks, L, N]
        gate = nn.sigmoid(nn.Conv(d_model, (1,), dtype=compute_dtype,
                                   name="output_gate")(h))
        h = jnp.tanh(nn.Conv(d_model, (1,), dtype=compute_dtype, name="output")(h)) * gate
        h = nn.Dense(d_model, use_bias=False, dtype=compute_dtype, name="end_proj")(h)
        mask = nn.relu(h).reshape(batch, n_spk, -1, d_model)

        # ---- mask + decoder (sepformer.py:154-184, 247-294)
        sep = mix_w[:, None] * mask  # [B, spks, L, N]
        sep = sep.reshape(batch * n_spk, -1, d_model)
        wav = nn.ConvTranspose(
            self.encoder_in_nchannels, (self.encoder_kernel_size,), strides=(stride,),
            padding="VALID", use_bias=False, dtype=compute_dtype, name="decoder",
        )(sep)  # [B*spks, T', C]
        wav = wav.astype(jnp.float32)
        wav = jnp.swapaxes(wav, 1, 2).reshape(batch, n_spk, self.encoder_in_nchannels, -1)
        t_est = wav.shape[-1]
        if t_origin > t_est:
            wav = jnp.pad(wav, ((0, 0), (0, 0), (0, 0), (0, t_origin - t_est)))
        return wav[..., :t_origin]
