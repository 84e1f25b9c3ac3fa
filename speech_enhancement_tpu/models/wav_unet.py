"""Wave-U-Net time-domain model (reference: src/model/wav_unet.py, 38.7 MB).

12 down-sampling Conv1d(k=15) + BN + LeakyReLU layers with stride-2
decimation (``o[:, :, ::2]``), a middle conv, then 12 up-sampling layers
with 2x linear interpolation (align_corners) and skip concats, finishing
with a 1x1 conv + tanh over [decoder output, input].

Layout: NWC [B, T, C] internally (TPU conv layout); boundary is the wav
contract [B, C, T] with C = 1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import WAV_MONO, SignalSpec


def _linear_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x linear interpolation, align_corners=True (torch F.interpolate)."""
    b, t, c = x.shape
    out_t = t * 2
    # align_corners: output position i maps to input coordinate i*(t-1)/(out_t-1)
    pos = jnp.arange(out_t) * (t - 1) / (out_t - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (pos - lo)[None, :, None]
    return x[:, lo, :] * (1.0 - frac) + x[:, hi, :] * frac


class _ConvBlock(nn.Module):
    features: int
    kernel: int
    dtype: object = jnp.float32  # conv/activation compute dtype (bf16 knob)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # conv + activation in the compute dtype; BatchNorm stats stay f32
        # (the r5 per-op trace: 76% of this model's step is elementwise
        # HBM passes, so halving activation bytes is the lever)
        x = nn.Conv(self.features, (self.kernel,), padding=self.kernel // 2,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1).astype(self.dtype)


class WavUNet(nn.Module):
    SPEC: SignalSpec = WAV_MONO

    unet_nlayers: int = 12
    channels_interval: int = 24
    dtype: str = "float32"  # compute dtype for convs/activations

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # wav: [B, C=1, T]. The reference requires T divisible by
        # 2**unet_nlayers (odd lengths crash its skip concats); here the
        # input is zero-padded up to the next multiple and the output
        # trimmed back — a robustness fix, same math on conforming lengths
        # (Demucs handles this the same way via valid_length).
        length = wav.shape[-1]
        block = 2 ** self.unet_nlayers
        pad = (-length) % block
        if pad:
            wav = jnp.pad(wav, ((0, 0), (0, 0), (0, pad)))
        x = jnp.swapaxes(wav, 1, 2).astype(jnp.dtype(self.dtype))  # [B, T, C]
        inp = x

        skips = []
        for i in range(self.unet_nlayers):
            x = _ConvBlock((i + 1) * self.channels_interval, 15,
                           dtype=jnp.dtype(self.dtype), name=f"enc_{i}")(x, train)
            skips.append(x)
            x = x[:, ::2, :]  # stride-2 decimation

        x = _ConvBlock(self.unet_nlayers * self.channels_interval, 15,
                       dtype=jnp.dtype(self.dtype), name="middle")(x, train)

        for i in range(self.unet_nlayers):
            x = _linear_upsample2(x)
            x = jnp.concatenate([x, skips[self.unet_nlayers - i - 1]], axis=-1)
            x = _ConvBlock(
                (self.unet_nlayers - i) * self.channels_interval, 5,
                dtype=jnp.dtype(self.dtype), name=f"dec_{i}"
            )(x, train)

        x = jnp.concatenate([x, inp], axis=-1)
        x = nn.Conv(1, (1,), name="out")(x)
        x = jnp.tanh(x.astype(jnp.float32))  # head/output stay f32
        return jnp.swapaxes(x, 1, 2)[..., :length]  # [B, 1, T]
