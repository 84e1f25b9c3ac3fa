"""DNN magnitude-mask model (reference: src/model/dnn.py, 10.3 MB).

Per-frame fully-connected stack over STFT magnitudes: n_layers blocks of
Linear -> BatchNorm -> activation -> dropout (last block Linear -> BN only),
with an optional context Linear + input/output EMA smoothers (alpha 0.1 in,
0.85 out; reference dnn.py:86-91). Output is a magnitude mask multiplied
into the complex input ("mask") or a magnitude-only reconstruction
("reconstruct").

TPU notes: all frames of the batch collapse into one [B*C*T, F] matrix so
each Linear is a single MXU matmul; the EMAs run as log-depth associative
scans instead of the reference's per-timestep Python loop (ema.py:24-40).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from speech_enhancement_tpu.models.types import STFT_MONO, SignalSpec
from speech_enhancement_tpu.ops.norms import ema_scan

_ACTIVATIONS = {
    "linear": lambda x: x,
    "leaky-relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
}


class DNN(nn.Module):
    SPEC: SignalSpec = STFT_MONO

    n_fft: int = 512
    n_layers: int = 4
    hidden_layer: int = 1024
    bias: bool = True
    activation: str = "leaky-relu"
    drop_out: float = 0.0
    dnn_method: str = "mask"
    dnn_ema: bool = True
    # compute dtype for the Dense stack ("bfloat16" = TPU fast path);
    # BatchNorm stats, the EMA scans, params and the mask multiply stay f32
    dtype: str = "float32"

    @nn.compact
    def __call__(self, mix: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mix: [B, C, F, T, 2]
        batch, n_channel, n_feature, n_frame, _ = mix.shape
        act = _ACTIVATIONS[self.activation]
        x = jnp.sqrt(mix[..., 0] ** 2 + mix[..., 1] ** 2)
        x = x.reshape(batch * n_channel, n_feature, n_frame)
        x = jnp.swapaxes(x, 1, 2)  # [B*C, T, F]

        if self.dnn_ema:
            x = nn.Dense(n_feature, use_bias=True, name="context")(x)
            x = ema_scan(x, 0.1, axis=1)

        cdt = None if self.dtype == "float32" else jnp.dtype(self.dtype)
        x = x.reshape(batch * n_channel * n_frame, n_feature)
        for layer in range(self.n_layers):
            last = layer == self.n_layers - 1
            width = n_feature if last else self.hidden_layer
            x = nn.Dense(width, use_bias=self.bias, dtype=cdt,
                         name=f"linear_{layer}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=jnp.float32, name=f"bn_{layer}"
            )(x)
            if not last:
                x = act(x)
                if cdt is not None:
                    x = x.astype(cdt)
                x = nn.Dropout(self.drop_out, deterministic=not train)(x)

        x = x.reshape(batch * n_channel, n_frame, n_feature).astype(jnp.float32)
        if self.dnn_ema:
            x = ema_scan(x, 0.85, axis=1)
        x = jnp.swapaxes(x, 1, 2).reshape(batch, n_channel, n_feature, n_frame)

        if self.dnn_method == "reconstruct":
            # torch path multiplies x by exp(i*angle(x)) with real x, which
            # collapses to (|x|, 0) (reference dnn.py:121-128).
            out = jnp.stack([jnp.abs(x), jnp.zeros_like(x)], axis=-1)
            return out
        # masking (reference dnn.py:131-138)
        return mix * x[..., None]
