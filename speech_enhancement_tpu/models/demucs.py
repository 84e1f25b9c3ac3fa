"""Demucs v2/v3-style time-domain separator (reference: src/model/demucs.py,
510 MB default; facebookresearch/denoiser lineage).

Encoder x depth: Conv1d(k=8, s=4) + GELU + optional DConv residual branch
(dilated convs, GroupNorm, GLU rewrite, LayerScale, optional LocalState
attention and chunked BLSTM) + 1x1 GLU rewrite; mirror decoder with
context conv, ConvTranspose1d and center-trimmed additive skips; on-the-fly
normalization and 2x polyphase resampling around the net; weight rescale
init (rescale_module, demucs.py:123-136) exposed as ``post_init_params``.

Layout: NWC [B, T, C] internally. The 2x resampling uses the shared MXU
polyphase kernel (ops/resample.py) instead of julius.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import WAV_MULTI, SignalSpec
from speech_enhancement_tpu.ops.resample import downsample2, upsample2
from speech_enhancement_tpu.ops.rnn import LSTMLayer


def center_trim(tensor: jnp.ndarray, length: int, axis: int = 1) -> jnp.ndarray:
    """Trim ``tensor`` along ``axis`` to ``length``, centered (demucs.py:30-51)."""
    delta = tensor.shape[axis] - length
    if delta < 0:
        raise ValueError(f"tensor ({tensor.shape[axis]}) shorter than reference ({length})")
    if delta == 0:
        return tensor
    start = delta // 2
    idx = [slice(None)] * tensor.ndim
    idx[axis] = slice(start, start + length)
    return tensor[tuple(idx)]


class LayerScale(nn.Module):
    """Diagonal residual rescale, init ~0 (demucs.py:52-71)."""

    init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", lambda k, s: jnp.full(s, self.init), (x.shape[-1],))
        return scale * x


class BLSTM(nn.Module):
    """BiLSTM over [B, T, C] with optional overlapped chunking (demucs.py:73-120).

    With ``max_steps`` set and T exceeding it, the input is framed into
    half-overlapping windows, the LSTM runs per window (batched — all
    windows in parallel), and outputs are stitched discarding stride/2
    samples at interior boundaries.
    """

    dim: int
    layers: int = 1
    max_steps: Optional[int] = None
    skip: bool = False
    # resident-weight Pallas LSTM recurrence (ops/pallas/lstm.py; gated to
    # the TPU backend + lane-aligned dim inside LSTMLayer)
    fused: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch, length, channels = x.shape
        y = x
        framed = False
        if self.max_steps is not None and length > self.max_steps:
            width = self.max_steps
            stride = width // 2
            n_frames = max(1, -(-(length - width) // stride) + 1)
            total = width + (n_frames - 1) * stride
            x = jnp.pad(x, ((0, 0), (0, total - length), (0, 0)))
            idx = jnp.arange(n_frames)[:, None] * stride + jnp.arange(width)[None, :]
            frames = x[:, idx, :]  # [B, n_frames, width, C]
            x = frames.reshape(batch * n_frames, width, channels)
            framed = True

        h = x
        for layer in range(self.layers):
            fwd, _ = LSTMLayer(self.dim, fused=self.fused,
                               name=f"l{layer}_fwd")(h)
            bwd, _ = LSTMLayer(self.dim, reverse=True, fused=self.fused,
                               name=f"l{layer}_bwd")(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.Dense(self.dim, name="linear")(h)

        if framed:
            frames = h.reshape(batch, n_frames, width, self.dim)
            limit = stride // 2
            pieces = []
            for k in range(n_frames):
                if n_frames == 1:
                    pieces.append(frames[:, k])
                elif k == 0:
                    pieces.append(frames[:, k, :-limit])
                elif k == n_frames - 1:
                    pieces.append(frames[:, k, limit:])
                else:
                    pieces.append(frames[:, k, limit:-limit])
            h = jnp.concatenate(pieces, axis=1)[:, :length]
        if self.skip:
            h = h + y
        return h


class LocalState(nn.Module):
    """Decay-windowed local attention, no positional embedding
    (demucs.py:210-269). O(T^2) over the encoder's downsampled time axis.
    """

    channels: int
    heads: int = 4
    ndecay: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]
        batch, length, channels = x.shape
        heads = self.heads
        head_dim = channels // heads

        def conv1x1(name, features, **kw):
            return nn.Conv(features, (1,), name=name, **kw)

        queries = conv1x1("query", channels)(x).reshape(batch, length, heads, head_dim)
        keys = conv1x1("key", channels)(x).reshape(batch, length, heads, head_dim)
        # dots[b, h, t(key), s(query)]
        dots = jnp.einsum("bthc,bshc->bhts", keys, queries) / math.sqrt(head_dim)

        if self.ndecay:
            decay_q = conv1x1(
                "query_decay", heads * self.ndecay,
                kernel_init=nn.initializers.variance_scaling(0.0001, "fan_in", "truncated_normal"),
                bias_init=nn.initializers.constant(-2.0),
            )(x).reshape(batch, length, heads, self.ndecay)
            decay_q = jax.nn.sigmoid(decay_q) / 2.0
            idx = jnp.arange(length)
            delta = jnp.abs(idx[:, None] - idx[None, :])  # [t, s]
            decays = jnp.arange(1, self.ndecay + 1)
            decay_kernel = -decays[:, None, None] * delta[None] / math.sqrt(self.ndecay)
            dots = dots + jnp.einsum("fts,bshf->bhts", decay_kernel, decay_q)

        eye = jnp.eye(length, dtype=bool)
        dots = jnp.where(eye[None, None], -100.0, dots)
        weights = jax.nn.softmax(dots, axis=2)

        content = conv1x1("content", channels)(x).reshape(batch, length, heads, head_dim)
        result = jnp.einsum("bhts,bthc->bshc", weights, content)
        result = result.reshape(batch, length, channels)
        return x + conv1x1("proj", channels)(result)


class DConv(nn.Module):
    """Residual branch: dilated conv -> norm -> GELU [-> BLSTM][-> attn]
    -> 1x1 to 2C -> norm -> GLU -> LayerScale (demucs.py:139-208)."""

    channels: int
    compress: float = 4.0
    depth: int = 2
    init: float = 1e-4
    norm: bool = True
    attn: bool = False
    heads: int = 4
    ndecay: int = 4
    lstm: bool = False
    kernel: int = 3
    dtype: object = None
    fused_rnn: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.channels / self.compress)
        for d in range(abs(self.depth)):
            dilation = 2**d if self.depth > 0 else 1
            pad = dilation * (self.kernel // 2)
            y = nn.Conv(
                hidden, (self.kernel,), padding=[(pad, pad)],
                kernel_dilation=(dilation,), dtype=self.dtype, name=f"d{d}_conv",
            )(x)
            if self.norm:
                y = nn.GroupNorm(num_groups=1, name=f"d{d}_norm1")(y)
            y = nn.gelu(y)
            if self.lstm:
                y = BLSTM(hidden, layers=2, max_steps=200, skip=True,
                          fused=self.fused_rnn, name=f"d{d}_lstm")(y)
            if self.attn:
                y = LocalState(hidden, heads=self.heads, ndecay=self.ndecay,
                               name=f"d{d}_attn")(y)
            y = nn.Conv(2 * self.channels, (1,), dtype=self.dtype,
                        name=f"d{d}_rewrite")(y)
            if self.norm:
                y = nn.GroupNorm(num_groups=1, name=f"d{d}_norm2")(y)
            y = jax.nn.glu(y, axis=-1)
            y = LayerScale(self.init, name=f"d{d}_scale")(y)
            x = x + y
        return x


class Demucs(nn.Module):
    SPEC: SignalSpec = WAV_MULTI

    sources: Tuple = (None, None)
    audio_channels: int = 2
    channels: int = 64
    growth: float = 2.0
    depth: int = 6
    rewrite: bool = True
    lstm_layers: int = 0
    kernel_size: int = 8
    stride: int = 4
    context: int = 1
    glu: bool = True
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_mode: int = 1
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_attn: int = 4
    dconv_lstm: int = 4
    dconv_init: float = 1e-4
    normalize: bool = True
    resample: bool = True
    rescale: float = 0.1
    # compute dtype for convs/LSTM ("bfloat16" = TPU fast path); params f32
    dtype: str = "float32"
    # resident-weight Pallas recurrence for the DConv/bottleneck BLSTMs
    # (hidden dims 256/512 at the shipped config are lane-aligned)
    fused_rnn: object = False
    # rematerialize each encoder/decoder layer in the backward pass: at
    # 510 MB params the saved activations of batch 16 x 4 s exceed one
    # v5e chip's 16 GB HBM without it. Param names are unchanged (the
    # lifted transform wraps methods of this module, not submodules).
    remat: bool = False

    def valid_length(self, length: int) -> int:
        """Nearest padded length with no conv remainder (demucs.py:430-451)."""
        if self.resample:
            length *= 2
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel_size) / self.stride) + 1
            length = max(1, length)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        if self.resample:
            length = math.ceil(length / 2)
        return int(length)

    @nn.compact
    def __call__(self, mix: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mix: [B, C, T] -> [B, S, C, T]
        length = mix.shape[-1]
        x = mix
        if self.normalize:
            mono = jnp.mean(mix, axis=1, keepdims=True)
            mean = jnp.mean(mono, axis=-1, keepdims=True)
            std = jnp.std(mono, axis=-1, keepdims=True, ddof=1)
            x = (x - mean) / (1e-5 + std)
        else:
            mean, std = 0.0, 1.0

        delta = self.valid_length(length) - length
        x = jnp.pad(x, ((0, 0), (0, 0), (delta // 2, delta - delta // 2)))
        if self.resample:
            x = upsample2(x)

        compute_dtype = jnp.dtype(self.dtype)
        x = jnp.swapaxes(x, 1, 2).astype(compute_dtype)  # NWC

        enc_layer = Demucs._enc_layer
        dec_layer = Demucs._dec_layer
        if self.remat:
            enc_layer = nn.remat(enc_layer, static_argnums=(2,))
            dec_layer = nn.remat(dec_layer, static_argnums=(3,))

        saved = []
        for index in range(self.depth):
            x = enc_layer(self, x, index)
            saved.append(x)

        if self.lstm_layers:
            x = BLSTM(self._enc_channels()[-1], layers=self.lstm_layers,
                      fused=self.fused_rnn, name="lstm")(x)

        for index in range(self.depth - 1, -1, -1):
            skip = center_trim(saved.pop(-1), x.shape[1], axis=1)
            x = dec_layer(self, x, skip, index)

        x = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # back to [B, C', T]
        if self.resample:
            x = downsample2(x)
        x = x * std + mean
        x = center_trim(x, length, axis=-1)
        return x.reshape(x.shape[0], len(self.sources), self.audio_channels, x.shape[-1])

    def _enc_channels(self):
        channels, out = self.channels, []
        for _ in range(self.depth):
            out.append(channels)
            channels = int(self.growth * channels)
        return out

    def _enc_layer(self, x: jnp.ndarray, index: int) -> jnp.ndarray:
        """One encoder layer (conv + norm + GELU [+ DConv] [+ GLU rewrite]).
        A method (not a submodule) so ``nn.remat`` can wrap it without
        changing parameter paths."""
        compute_dtype = jnp.dtype(self.dtype)
        ch_scale = 2 if self.glu else 1
        act_gate = (lambda v: jax.nn.glu(v, axis=-1)) if self.glu else nn.relu
        channels = self._enc_channels()[index]
        use_norm = index >= self.norm_starts
        x = nn.Conv(channels, (self.kernel_size,), strides=(self.stride,),
                    padding="VALID", dtype=compute_dtype,
                    name=f"enc_{index}_conv")(x)
        if use_norm:
            x = nn.GroupNorm(num_groups=self.norm_groups, name=f"enc_{index}_norm")(x)
        x = nn.gelu(x)
        if self.dconv_mode & 1:
            x = DConv(
                channels, compress=self.dconv_comp, depth=self.dconv_depth,
                init=self.dconv_init, attn=index >= self.dconv_attn,
                lstm=index >= self.dconv_lstm, dtype=compute_dtype,
                fused_rnn=self.fused_rnn,
                name=f"enc_{index}_dconv",
            )(x)
        if self.rewrite:
            x = nn.Conv(ch_scale * channels, (1,), dtype=compute_dtype,
                        name=f"enc_{index}_rewrite")(x)
            if use_norm:
                x = nn.GroupNorm(num_groups=self.norm_groups,
                                 name=f"enc_{index}_rwnorm")(x)
            x = act_gate(x)
        return x

    def _dec_layer(self, x: jnp.ndarray, skip: jnp.ndarray, index: int) -> jnp.ndarray:
        """One decoder layer (skip add + context rewrite [+ DConv] + tconv)."""
        compute_dtype = jnp.dtype(self.dtype)
        ch_scale = 2 if self.glu else 1
        act_gate = (lambda v: jax.nn.glu(v, axis=-1)) if self.glu else nn.relu
        enc_channels = self._enc_channels()
        channels = enc_channels[index]
        out_channels = (
            enc_channels[index - 1] if index > 0
            else len(self.sources) * self.audio_channels
        )
        use_norm = index >= self.norm_starts
        x = x + skip
        if self.rewrite:
            x = nn.Conv(ch_scale * channels, (2 * self.context + 1,),
                        padding=[(self.context, self.context)],
                        dtype=compute_dtype, name=f"dec_{index}_rewrite")(x)
            if use_norm:
                x = nn.GroupNorm(num_groups=self.norm_groups,
                                 name=f"dec_{index}_rwnorm")(x)
            x = act_gate(x)
        if self.dconv_mode & 2:
            x = DConv(
                channels, compress=self.dconv_comp, depth=self.dconv_depth,
                init=self.dconv_init, attn=index >= self.dconv_attn,
                lstm=index >= self.dconv_lstm, dtype=compute_dtype,
                fused_rnn=self.fused_rnn,
                name=f"dec_{index}_dconv",
            )(x)
        x = nn.ConvTranspose(out_channels, (self.kernel_size,),
                             strides=(self.stride,), padding="VALID",
                             dtype=compute_dtype, name=f"dec_{index}_tconv")(x)
        if index > 0:
            if use_norm:
                x = nn.GroupNorm(num_groups=self.norm_groups,
                                 name=f"dec_{index}_norm")(x)
            x = nn.gelu(x)
        return x

    def post_init_params(self, params):
        """Weight-rescale init (reference rescale_module, demucs.py:123-136):
        divide each conv kernel+bias by (std / rescale) ** 0.5."""
        if not self.rescale:
            return params

        def walk(tree):
            out = {}
            for key, value in tree.items():
                if isinstance(value, dict):
                    # conv kernels are rank >= 3; Linear layers are untouched
                    # (reference rescales only Conv/ConvTranspose modules)
                    if "kernel" in value and value["kernel"].ndim >= 3:
                        std = jnp.std(value["kernel"])
                        scale = jnp.sqrt(jnp.maximum(std / self.rescale, 1e-8))
                        new = dict(value)
                        new["kernel"] = value["kernel"] / scale
                        if "bias" in new:
                            new["bias"] = value["bias"] / scale
                        out[key] = new
                    else:
                        out[key] = walk(value)
                else:
                    out[key] = value
            return out

        return walk(params)
