"""Dilated TCN models.

The reference declares ``DilatedTCN`` / ``EncoderDecoderTCN`` / ``TFCN`` but
leaves every body unimplemented (src/model/tcn.py:12-30 is all ``...``).
Here ``DilatedTCN`` is a working causal dilated temporal conv net
(the standard low-latency enhancement TCN; cf. PAPERS.md "Exploring the Best
Loss Function for DNN-Based Low-latency Speech Enhancement with Temporal
Convolutional Networks"), so the registry name is functional rather than a
stub.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import WAV_MONO, SignalSpec


class _TCNBlock(nn.Module):
    hidden: int
    channels: int
    kernel: int
    dilation: int
    dtype: object = None  # conv/activation compute dtype; GroupNorm f32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel - 1) * self.dilation  # causal
        y = nn.Conv(self.hidden, (self.kernel,), padding=[(pad, 0)],
                    kernel_dilation=(self.dilation,), dtype=self.dtype,
                    name="dilated")(x)
        y = nn.gelu(y)
        y = nn.GroupNorm(num_groups=1, name="norm")(y)
        y = nn.Conv(self.channels, (1,), dtype=self.dtype, name="project")(y)
        if self.dtype is not None:
            y = y.astype(self.dtype)
            x = x.astype(self.dtype)
        return x + y


class DilatedTCN(nn.Module):
    SPEC: SignalSpec = WAV_MONO

    tcn_channels: int = 64
    tcn_hidden: int = 128
    tcn_kernel: int = 3
    tcn_blocks: int = 8
    tcn_repeats: int = 2
    tcn_stride: int = 16
    # compute dtype for the conv stack ("bfloat16" = TPU fast path)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # wav: [B, C=1, T] -> [B, 1, T]
        cdt = None if self.dtype == "float32" else jnp.dtype(self.dtype)
        x = jnp.swapaxes(wav, 1, 2)
        x = nn.Conv(self.tcn_channels, (self.tcn_stride * 2,),
                    strides=(self.tcn_stride,), padding="SAME", dtype=cdt,
                    name="encoder")(x)
        for r in range(self.tcn_repeats):
            for b in range(self.tcn_blocks):
                x = _TCNBlock(self.tcn_hidden, self.tcn_channels, self.tcn_kernel,
                              2**b, dtype=cdt, name=f"block_{r}_{b}")(x)
        x = x.astype(jnp.float32)
        x = nn.ConvTranspose(1, (self.tcn_stride * 2,), strides=(self.tcn_stride,),
                             padding="SAME", name="decoder")(x)
        x = jnp.swapaxes(x, 1, 2)
        return x[..., : wav.shape[-1]]
