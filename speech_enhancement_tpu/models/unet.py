"""UNet magnitude-mask model (reference: src/model/unet.py, 7.5 MB).

Classic UNet over the power spectrogram: ``unet_layer`` Down blocks
(DoubleConv -> MaxPool2), a Dropout-regularized middle DoubleConv, and
mirror Up blocks (ConvTranspose or bilinear upsample + skip concat), with a
final Up against the input map producing a mask multiplied into the complex
mixture.

Quirk preserved: the reference's "amplitude" is ``|re^2 + im^2|`` — the
power, not the magnitude (unet.py:40, SURVEY §6b.2).

Layout: NHWC [B, F, T, C] internally.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import STFT_MONO, SignalSpec


class _DoubleConv(nn.Module):
    features: int
    mid_features: int | None = None
    dropout: float = 0.0
    dtype: object = jnp.float32  # conv/activation compute dtype (bf16 knob)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        mid = self.mid_features or self.features
        # convs + activations run in the compute dtype; BatchNorm stats
        # stay f32 (flax promotes) — the r5 per-op trace showed this model
        # is elementwise/reduce-traffic bound, so halving activation bytes
        # is the lever (docs/RESULTS.md 3b-addendum-2)
        x = x.astype(self.dtype)
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(x)
        x = nn.leaky_relu(x, negative_slope=0.01).astype(self.dtype)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _pad_to(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    return jnp.pad(
        x, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0))
    )


class UNet(nn.Module):
    SPEC: SignalSpec = STFT_MONO

    unet_channels: int = 1
    unet_layer: int = 4
    bilinear: bool = False
    dtype: str = "float32"  # compute dtype for convs/activations

    @nn.compact
    def __call__(self, mix: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mix: [B, C, F, T, 2]
        amp = jnp.abs(mix[..., 0] ** 2 + mix[..., 1] ** 2)  # power quirk (unet.py:40)
        x = jnp.moveaxis(amp, 1, -1)  # [B, F, T, C]
        amp_nhwc = x

        interval = 16
        channels = [self.unet_channels] + [
            (2**n) * interval for n in range(self.unet_layer + 1)
        ]

        skips = []
        for n in range(self.unet_layer):
            x = _DoubleConv(
                channels[n + 1],
                dropout=0.0 if n < self.unet_layer - 1 else 0.5,
                dtype=jnp.dtype(self.dtype),
                name=f"down_{n}",
            )(x, train)
            x = _maxpool2(x)
            skips.append(x)

        x = _DoubleConv(channels[-1], dropout=0.5,
                        dtype=jnp.dtype(self.dtype), name="middle")(x, train)

        rev = channels[::-1]
        for n in range(self.unet_layer):
            skip = skips[len(skips) - 1 - n]
            if n > 0:
                x = self._up(x, rev[n], train, name=f"up_{n}")
            x = _pad_to(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
            x = _DoubleConv(
                rev[n + 1],
                mid_features=rev[n] // 2 if self.bilinear else None,
                dtype=jnp.dtype(self.dtype),
                name=f"dec_{n}",
            )(x, train)

        # final Up against the raw amplitude map
        x = self._up(x, rev[-2], train, name="up_out")
        x = _pad_to(x, amp_nhwc.shape[1], amp_nhwc.shape[2])
        x = jnp.concatenate([x, amp_nhwc], axis=-1)
        # bilinear Ups use mid = in_channels // 2 (reference Up.__init__)
        x = _DoubleConv(
            self.unet_channels,
            mid_features=rev[-2] // 2 if self.bilinear else None,
            dtype=jnp.dtype(self.dtype),
            name="dec_out",
        )(x, train)

        mask = jnp.moveaxis(x, -1, 1).astype(mix.dtype)  # [B, C, F, T]
        return mix * mask[..., None]

    def _up(self, x: jnp.ndarray, in_channels: int, train: bool, name: str) -> jnp.ndarray:
        if self.bilinear:
            # torch nn.Upsample(scale_factor=2, align_corners=True):
            # output i maps to input i*(n-1)/(2n-1) — jax.image.resize has
            # no align_corners mode, so interpolate explicitly
            def up1d(y, axis):
                n = y.shape[axis]
                pos = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
                lo = jnp.floor(pos).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, n - 1)
                frac_shape = [1] * y.ndim
                frac_shape[axis] = 2 * n
                frac = (pos - lo).reshape(frac_shape)
                take = lambda idx: jnp.take(y, idx, axis=axis)  # noqa: E731
                return take(lo) * (1.0 - frac) + take(hi) * frac

            return up1d(up1d(x, 1), 2)
        return nn.ConvTranspose(
            in_channels // 2, (2, 2), strides=(2, 2), padding="VALID",
            dtype=jnp.dtype(self.dtype), name=name
        )(x)
