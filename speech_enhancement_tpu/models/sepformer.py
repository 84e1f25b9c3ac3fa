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


def relative_positions(length: int, d_model: int) -> np.ndarray:
    """Bidirectional sinusoidal embeddings for offsets L-1 .. -(L-1).

    The pos_embs input of the reference's RelPosMHAXL ("(1, 2*S-1, E)",
    Transformer.py:658-663) — Transformer-XL style, positive offsets first.
    """
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    out = np.zeros((2 * length - 1, d_model), np.float32)
    out[:, 0::2] = np.sin(pos * div)
    out[:, 1::2] = np.cos(pos * div[: (d_model + 1) // 2])
    return out


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative-shift trick (reference Transformer.py:620-637).

    [B, H, L, 2L-1] scores against offset-ordered positions -> [B, H, L, L]
    where out[:, :, i, j] picks the score at relative offset (i - j).
    """
    b, h, qlen, pos_len = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # (b, h, L, 2L)
    x = x.reshape(b, h, pos_len + 1, qlen)
    x = x[:, :, 1:].reshape(b, h, qlen, pos_len)
    return x[..., : pos_len // 2 + 1]


class RelPosMHAXL(nn.Module):
    """Transformer-XL relative positional multi-head attention.

    Faithful port of the reference's RelPosMHAXL (Transformer.py:515-792,
    Dai et al. 2019): packed qkv projection, position projection without
    bias, learned per-head content/position biases (pos_bias_u/v), the
    rel-shift trick, and the reference's 1/sqrt(embed_dim) scale (NOT the
    usual per-head 1/sqrt(head_dim) — a reference quirk preserved).
    """

    embed_dim: int
    num_heads: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_embs: jnp.ndarray) -> jnp.ndarray:
        bsz, qlen, _ = x.shape
        head_dim = self.embed_dim // self.num_heads
        assert head_dim * self.num_heads == self.embed_dim

        qkv = nn.Dense(3 * self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="in_proj")(x)
        qkv = qkv.reshape(bsz, qlen, self.num_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [B, L, H, D] each

        p_k = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="linear_pos")(pos_embs.astype(qkv.dtype))
        p_k = p_k.reshape(1, -1, self.num_heads, head_dim)  # [1, 2L-1, H, D]

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(), (head_dim, self.num_heads)
        ).T.astype(qkv.dtype)
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(), (head_dim, self.num_heads)
        ).T.astype(qkv.dtype)

        # content score: (q + u) . k        [B, H, L, L]
        matrix_ac = jnp.einsum("blhd,bmhd->bhlm", q + pos_bias_u[None, None], k)
        # position score: (q + v) . p_k     [B, H, L, 2L-1] -> rel-shifted
        matrix_bd = jnp.einsum("blhd,xmhd->bhlm", q + pos_bias_v[None, None], p_k)
        matrix_bd = _rel_shift(matrix_bd)

        scale = 1.0 / math.sqrt(self.embed_dim)  # reference Transformer.py:607
        score = (matrix_ac + matrix_bd) * scale
        probs = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(qkv.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v)
        out = out.reshape(bsz, qlen, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class _FusedMHA(nn.Module):
    """Param-tree twin of flax ``nn.MultiHeadDotProductAttention``
    (self-attention, no mask) whose softmax(QK^T)V core runs in the fused
    Pallas kernel (ops/pallas/attention.py): the [L, L] score/probability
    tensors stay in VMEM instead of round-tripping HBM per layer. Same
    query/key/value/out DenseGeneral parameters, so checkpoints swap
    between the XLA and fused paths freely.
    """

    num_heads: int
    qkv_features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import functools

        from speech_enhancement_tpu.ops.pallas.attention import fused_mha_packed

        batch, length, _ = x.shape
        head_dim = self.qkv_features // self.num_heads
        dense = functools.partial(
            nn.DenseGeneral, features=(self.num_heads, head_dim),
            dtype=self.dtype)
        # pack [B, L, H, D] -> [B, H*D, L] immediately: any array with the
        # 32-wide head_dim minor gets 4x tile-padded in HBM (see
        # ops/pallas/attention.py layout note)
        pack = lambda t: jnp.swapaxes(  # noqa: E731
            t.reshape(batch, length, self.num_heads * head_dim), 1, 2)
        q = pack(dense(name="query")(x))
        k = pack(dense(name="key")(x))
        v = pack(dense(name="value")(x))
        interpret = jax.default_backend() != "tpu"
        o = fused_mha_packed(q, k, v, self.num_heads, 0.0, interpret)
        o = jnp.swapaxes(o, 1, 2).reshape(batch, length, self.num_heads,
                                          head_dim)
        return nn.DenseGeneral(features=x.shape[-1], axis=(-2, -1),
                               dtype=self.dtype, name="out")(o)


class TransformerEncoderLayer(nn.Module):
    """Pre/post-norm MHA + positionwise FFN (reference Transformer.py:24-264).

    ``attention_type`` selects torch-style dot-product MHA ("regularMHA") or
    Transformer-XL relative positional MHA ("RelPosMHAXL"), mirroring the
    reference's TransformerEncoderLayer switch (Transformer.py:137-264).
    ``fused_attention`` routes the regularMHA core through the Pallas
    kernel (same parameters — see :class:`_FusedMHA`).
    """

    d_model: int
    nhead: int
    d_ffn: int
    norm_before: bool = True
    dropout: float = 0.0
    attention_type: str = "regularMHA"
    fused_attention: bool = False
    # FFN activation: the reference's PositionalwiseFeedForward defaults to
    # ReLU (Transformer.py:485,496-503) and SBTransformerBlock never
    # overrides it; "gelu" kept as an option
    ffn_activation: str = "relu"
    dtype: object = None

    def _act(self, h: jnp.ndarray) -> jnp.ndarray:
        return nn.gelu(h) if self.ffn_activation == "gelu" else nn.relu(h)

    def _attend(self, h: jnp.ndarray, pos_embs) -> jnp.ndarray:
        if self.attention_type == "RelPosMHAXL":
            return RelPosMHAXL(self.d_model, self.nhead, dtype=self.dtype,
                               name="mha")(h, pos_embs)
        if self.fused_attention:
            return _FusedMHA(self.nhead, self.d_model, dtype=self.dtype,
                             name="mha")(h)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="mha"
        )
        return attn(h, h)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_embs=None, train: bool = False) -> jnp.ndarray:
        ln1 = nn.LayerNorm(name="ln1")
        ln2 = nn.LayerNorm(name="ln2")
        from jax.ad_checkpoint import checkpoint_name

        if self.norm_before:
            h = ln1(x)
            x = x + checkpoint_name(self._attend(h, pos_embs), "attn_out")
            h = ln2(x)
            h = nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn1")(h)
            h = self._act(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(h)
            return x + h
        h = checkpoint_name(self._attend(x, pos_embs), "attn_out")
        x = ln1(x + h)
        h = self._act(nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn1")(x))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(h)
        return ln2(x + h)


class SBTransformerBlock(nn.Module):
    """Transformer encoder stack with optional sinusoidal positions
    (reference sepformer.py:558-654). With RelPosMHAXL the absolute
    positional encoding is skipped and shared relative embeddings feed every
    layer (the speechbrain arrangement)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    use_positional_encoding: bool = True
    norm_before: bool = True
    attention_type: str = "regularMHA"
    fused_attention: bool = False
    remat: bool = False
    # comma-separated checkpoint_name saves under remat (e.g. "attn_out":
    # keep attention outputs, recompute only norms/FFN elementwise in the
    # backward — trades ~130 MB/layer of residuals for the Pallas fwd
    # recompute)
    remat_policy: str = ""
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pos_embs = None
        if self.attention_type == "RelPosMHAXL":
            pos_embs = jnp.asarray(relative_positions(x.shape[1], self.d_model))
        elif self.use_positional_encoding:
            pos = jnp.asarray(sinusoidal_positions(x.shape[1], self.d_model))
            x = x + pos[None].astype(x.dtype)
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # PER-LAYER remat (not per dual block): the backward recompute
            # of a whole block keeps every layer's intermediates live at
            # once (measured 16.2 GB OOM at sepformer batch 16 even with
            # the fused-attention kernel); per layer, only one layer's
            # recompute is live while ~[B', L, N] outputs persist between
            # layers. Same recompute FLOPs either way.
            kwargs = {}
            if self.remat_policy:
                kwargs["policy"] = jax.checkpoint_policies.save_only_these_names(
                    *self.remat_policy.split(","))
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,),
                                 **kwargs)
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.nhead, self.d_ffn, self.norm_before,
                attention_type=self.attention_type,
                fused_attention=self.fused_attention, dtype=self.dtype,
                name=f"layer_{i}",
            )(x, pos_embs, train)
        # final stack LayerNorm (reference TransformerEncoder.norm,
        # Transformer.py:92,133 — applied after the layer loop)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class SBRNNBlock(nn.Module):
    """RNN block for the dual-path pipeline (reference sepformer.py:790-848):
    a (bi)directional LSTM/GRU stack whose output is projected back to
    d_model by the Dual_Computation_Block linear (sepformer.py:707-726)."""

    hidden_channels: int
    num_layers: int = 1
    rnn_type: str = "lstm"
    bidirectional: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from speech_enhancement_tpu.ops.rnn import RNNStack

        return RNNStack(
            rnn_type=self.rnn_type, hidden_size=self.hidden_channels,
            num_layers=self.num_layers, bidirectional=self.bidirectional,
            name="rnn",
        )(x, train=train)


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
    (reference sepformer.py:656-787). Intra and inter paths carry
    independent head/FFN settings, and each path can be a transformer
    stack or an SBRNNBlock + linear (the reference's
    linear_layer_after_inter_intra arrangement, sepformer.py:707-726)."""

    d_model: int
    intra_layers: int
    inter_layers: int
    intra_nhead: int
    inter_nhead: int
    intra_dffn: int
    inter_dffn: int
    intra_block: str = "transformer"  # "transformer" | "rnn"
    inter_block: str = "transformer"
    rnn_hidden: int = 256
    rnn_bidirectional: bool = True
    attention_type: str = "regularMHA"
    fused_attention: bool = False
    remat: bool = False
    remat_policy: str = ""
    skip_around_intra: bool = True
    dtype: object = None

    def _path(self, x, *, layers, nhead, dffn, block, name, train):
        if block == "rnn":
            h = SBRNNBlock(
                self.rnn_hidden, num_layers=layers, rnn_type="lstm",
                bidirectional=self.rnn_bidirectional, dtype=self.dtype,
                name=name,
            )(x, train=train)
            # project (2*)hidden back to d_model (reference's intra/inter
            # Linear after an RNN block, sepformer.py:709-714)
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name=f"{name}_linear")(h)
        return SBTransformerBlock(
            layers, self.d_model, nhead, dffn,
            attention_type=self.attention_type,
            fused_attention=self.fused_attention, remat=self.remat,
            remat_policy=self.remat_policy,
            dtype=self.dtype, name=name,
        )(x, train=train)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, S, K, N]
        batch, n_chunks, k, features = x.shape
        intra = x.reshape(batch * n_chunks, k, features)
        intra = self._path(
            intra, layers=self.intra_layers, nhead=self.intra_nhead,
            dffn=self.intra_dffn, block=self.intra_block, name="intra",
            train=train,
        )
        intra = intra.reshape(batch, n_chunks, k, features)
        intra = GlobalLayerNorm(name="intra_norm")(intra)
        if self.skip_around_intra:
            intra = intra + x

        inter = intra.transpose(0, 2, 1, 3).reshape(batch * k, n_chunks, features)
        inter = self._path(
            inter, layers=self.inter_layers, nhead=self.inter_nhead,
            dffn=self.inter_dffn, block=self.inter_block, name="inter",
            train=train,
        )
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
    # "regularMHA" (torch MultiheadAttention analogue) or "RelPosMHAXL"
    # (Transformer-XL relative positional attention, Transformer.py:515-792)
    attention_type: str = "regularMHA"
    # intra/inter path block type: "transformer" or "rnn" (SBRNNBlock,
    # sepformer.py:790-848)
    intra_block: str = "transformer"
    inter_block: str = "transformer"
    rnn_hidden: int = 256
    rnn_bidirectional: bool = True
    # compute dtype for attention/FFN/convs ("bfloat16" = TPU fast path)
    dtype: str = "float32"
    # rematerialize each TransformerEncoderLayer in the backward pass.
    # Without it every intra/inter attention/FFN intermediate
    # ([B*S, H, K, K] probs x 2 paths x layers x masknet_numlayers on the
    # XLA path; [B', L, d_ffn] hiddens either way) is saved for backward,
    # which is what kept batch 16 x 4 s off one 16 GB chip (VERDICT r2
    # weak-4). Granularity is PER LAYER, not per dual block: a
    # whole-block recompute keeps all of the block's layers live at once
    # (measured 16.2-48.6 GB) while per-layer liveness is one layer's
    # intermediates + [B', L, N] outputs between layers.
    remat: bool = False
    # checkpoint_name saves under remat ("attn_out" keeps attention
    # outputs so the backward recomputes only norms/FFN)
    remat_policy: str = ""
    # run regularMHA attention cores through the fused Pallas kernel
    # (ops/pallas/attention.py): QK^T -> softmax -> @V stays in VMEM, so
    # the [L, L] probability tensors never touch HBM — the batch-16 train
    # step was measured at 80% of the HBM roofline with them (NOTES_DEV).
    # True (default) = on the TPU backend; "force" = everywhere incl.
    # interpret mode (tests); False = XLA attention. Parameters are
    # identical either way (_FusedMHA is a flax-MHA param twin).
    fused_attention: object = True

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
        use_fused_attn = bool(self.fused_attention) and (
            jax.default_backend() == "tpu" or self.fused_attention == "force"
        )
        for i in range(self.masknet_numlayers):
            h = DualComputationBlock(
                d_model, self.intra_numlayers, self.inter_numlayers,
                intra_nhead=self.intra_nhead, inter_nhead=self.inter_nhead,
                intra_dffn=self.intra_dffn, inter_dffn=self.inter_dffn,
                intra_block=self.intra_block, inter_block=self.inter_block,
                rnn_hidden=self.rnn_hidden,
                rnn_bidirectional=self.rnn_bidirectional,
                attention_type=self.attention_type,
                fused_attention=use_fused_attn, remat=self.remat,
                remat_policy=self.remat_policy,
                skip_around_intra=self.masknet_extraskipconnection,
                dtype=compute_dtype, name=f"dual_{i}",
            )(h, train)
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
