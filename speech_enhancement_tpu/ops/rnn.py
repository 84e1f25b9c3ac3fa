"""Recurrent layers as ``lax.scan`` kernels (TPU-first).

The reference leans on cuDNN LSTMs (e.g. CRN's 1792-wide 2-layer LSTM,
src/model/crn.py:88; DCCRN's complex LSTM, src/model/dccrn.py:264-302;
mel-rnn / rnn-stft-mask's (bi)RNN stacks, src/model/mel_rnn.py:41-61,
src/model/stft_rnn.py:39-62). On TPU we restructure:

* the input projection ``x @ W`` for *all* timesteps is hoisted out of the
  recurrence into one large MXU matmul over [B*T, D];
* the scan body then only computes the [B, H] @ [H, 4H] recurrent matmul
  plus elementwise gates — the minimal serial work;
* bidirectional = two scans (one reversed), concatenated;
* gate ordering follows torch (i, f, g, o) so parity tests can load torch
  weights directly.

All modules take and return batch-major [B, T, D] tensors.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(hidden_size: int):
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMLayer(nn.Module):
    """Single-direction LSTM layer over [B, T, D] -> [B, T, H]."""

    hidden_size: int
    reverse: bool = False
    use_bias: bool = True
    unroll: int = 1  # lax.scan unroll factor (amortizes loop overhead on TPU)
    dtype: Any = None  # compute dtype (e.g. bfloat16); params stay float32
    # route the recurrence through the resident-weight Pallas kernel
    # (ops/pallas/lstm.py): True = on the TPU backend when H is
    # lane-aligned; "force" = everywhere incl. interpret mode (tests);
    # False = lax.scan. Parameters and math are identical either way.
    fused: object = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        init_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        batch, _, in_dim = x.shape
        h_dim = self.hidden_size
        init = _uniform_init(h_dim)
        w_ih = self.param("w_ih", init, (in_dim, 4 * h_dim))
        w_hh = self.param("w_hh", init, (h_dim, 4 * h_dim))
        if self.use_bias:
            b_ih = self.param("b_ih", init, (4 * h_dim,))
            b_hh = self.param("b_hh", init, (4 * h_dim,))
            bias = b_ih + b_hh
        else:
            bias = 0.0

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        w_ih = w_ih.astype(compute_dtype)
        w_hh = w_hh.astype(compute_dtype)
        if self.use_bias:
            bias = bias.astype(compute_dtype)
        # Hoist the input projection: one big MXU matmul for the whole sequence.
        x_proj = jnp.einsum(
            "btd,dh->bth", x, w_ih, preferred_element_type=jnp.float32
        ).astype(compute_dtype) + bias
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # time-major for scan

        if init_state is None:
            h0 = jnp.zeros((batch, h_dim), x.dtype)
            c0 = jnp.zeros((batch, h_dim), x.dtype)
        else:
            # match the scan carry dtype (a caller-held f32 state must not
            # change the carry dtype mid-scan under a bf16 compute dtype)
            h0, c0 = (s.astype(x.dtype) for s in init_state)

        use_fused = bool(self.fused) and h_dim % 128 == 0 and (
            self.fused == "force" or jax.default_backend() == "tpu"
        )
        if use_fused:
            from speech_enhancement_tpu.ops.pallas.lstm import fused_lstm

            interpret = jax.default_backend() != "tpu"
            out, h_last, c_last = fused_lstm(
                x_proj, w_hh, h0, c0, self.reverse, interpret)
            return jnp.swapaxes(out, 0, 1), (h_last.astype(x.dtype),
                                             c_last.astype(x.dtype))

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.dot(h, w_hh, preferred_element_type=jnp.float32).astype(x.dtype)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_last, c_last), out = jax.lax.scan(
            step, (h0, c0), x_proj, reverse=self.reverse, unroll=self.unroll
        )
        return jnp.swapaxes(out, 0, 1), (h_last, c_last)


class GRULayer(nn.Module):
    """Single-direction GRU layer over [B, T, D] -> [B, T, H] (torch gate order r, z, n)."""

    hidden_size: int
    reverse: bool = False
    use_bias: bool = True
    unroll: int = 1
    dtype: Any = None  # compute dtype (e.g. bfloat16); params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch, _, in_dim = x.shape
        h_dim = self.hidden_size
        init = _uniform_init(h_dim)
        w_ih = self.param("w_ih", init, (in_dim, 3 * h_dim))
        w_hh = self.param("w_hh", init, (h_dim, 3 * h_dim))
        if self.use_bias:
            b_ih = self.param("b_ih", init, (3 * h_dim,))
            b_hh = self.param("b_hh", init, (3 * h_dim,))
        else:
            b_ih = b_hh = 0.0

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        w_ih = w_ih.astype(compute_dtype)
        w_hh = w_hh.astype(compute_dtype)
        if self.use_bias:
            b_ih = b_ih.astype(compute_dtype)
            b_hh = b_hh.astype(compute_dtype)

        x_proj = jnp.einsum(
            "btd,dh->bth", x, w_ih, preferred_element_type=jnp.float32
        ).astype(compute_dtype) + b_ih
        x_proj = jnp.swapaxes(x_proj, 0, 1)
        h0 = jnp.zeros((batch, h_dim), x.dtype)

        def step(h, xp):
            hp = jnp.dot(h, w_hh, preferred_element_type=jnp.float32).astype(x.dtype) + b_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        _, out = jax.lax.scan(step, h0, x_proj, reverse=self.reverse,
                              unroll=self.unroll)
        return jnp.swapaxes(out, 0, 1)


class VanillaRNNLayer(nn.Module):
    """Elman RNN with tanh (torch nn.RNN default)."""

    hidden_size: int
    reverse: bool = False
    use_bias: bool = True
    unroll: int = 1
    dtype: Any = None  # compute dtype (e.g. bfloat16); params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch, _, in_dim = x.shape
        h_dim = self.hidden_size
        init = _uniform_init(h_dim)
        w_ih = self.param("w_ih", init, (in_dim, h_dim))
        w_hh = self.param("w_hh", init, (h_dim, h_dim))
        b = self.param("b", init, (h_dim,)) if self.use_bias else 0.0

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        w_ih = w_ih.astype(compute_dtype)
        w_hh = w_hh.astype(compute_dtype)
        if self.use_bias:
            b = b.astype(compute_dtype)

        x_proj = jnp.swapaxes(jnp.einsum(
            "btd,dh->bth", x, w_ih, preferred_element_type=jnp.float32
        ).astype(compute_dtype) + b, 0, 1)
        h0 = jnp.zeros((batch, h_dim), x.dtype)

        def step(h, xp):
            h_new = jnp.tanh(xp + jnp.dot(h, w_hh, preferred_element_type=jnp.float32).astype(x.dtype))
            return h_new, h_new

        _, out = jax.lax.scan(step, h0, x_proj, reverse=self.reverse,
                              unroll=self.unroll)
        return jnp.swapaxes(out, 0, 1)


class RNNStack(nn.Module):
    """Multi-layer, optionally bidirectional RNN stack (torch nn.LSTM-like).

    rnn_type: "lstm" | "gru" | "rnn". Output dim = hidden * (2 if bi else 1).
    Dropout (between layers, train-time) matches torch semantics.
    """

    rnn_type: str
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    use_bias: bool = True
    unroll: int = 1
    dtype: Any = None  # compute dtype (e.g. bfloat16); params stay float32
    # resident-weight Pallas recurrence (LSTM layers only; see LSTMLayer)
    fused: object = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        layer_cls = {"lstm": LSTMLayer, "gru": GRULayer, "rnn": VanillaRNNLayer}[self.rnn_type]
        fused_kw = {"fused": self.fused} if self.rnn_type == "lstm" else {}
        out = x
        for layer in range(self.num_layers):
            fwd = layer_cls(self.hidden_size, use_bias=self.use_bias,
                            unroll=self.unroll, dtype=self.dtype,
                            name=f"l{layer}_fwd", **fused_kw)(out)
            if isinstance(fwd, tuple):
                fwd = fwd[0]
            if self.bidirectional:
                bwd = layer_cls(self.hidden_size, reverse=True, use_bias=self.use_bias,
                                unroll=self.unroll, dtype=self.dtype,
                                name=f"l{layer}_bwd", **fused_kw)(out)
                if isinstance(bwd, tuple):
                    bwd = bwd[0]
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
            if self.dropout > 0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ComplexLSTM(nn.Module):
    """DCCRN's "naive" complex LSTM (reference: src/model/dccrn.py:264-302).

    Two real LSTMs (r, i) cross-combined: out_r = Lr(xr) - Li(xi),
    out_i = Lr(xi) + Li(xr), with optional complex output projection.
    Input/output: pair of [B, T, D] arrays (real, imag).
    """

    hidden_size: int
    projection_dim: Optional[int] = None
    unroll: int = 8
    dtype: Any = None
    # stream mode (serve/streaming.py): accept/return the two stacked-batch
    # LSTM states so a chunked stream continues the exact recurrence. The
    # state is ((h_r, c_r), (h_i, c_i)) with each array [2B, H] (the
    # stacked [xr; xi] batch trick below).
    return_state: bool = False

    @nn.compact
    def __call__(self, xr: jnp.ndarray, xi: jnp.ndarray, init_state=None):
        lstm_r = LSTMLayer(self.hidden_size, unroll=self.unroll, dtype=self.dtype,
                           name="real_lstm")
        lstm_i = LSTMLayer(self.hidden_size, unroll=self.unroll, dtype=self.dtype,
                           name="imag_lstm")
        # The reference runs 4 LSTM passes (r2r/r2i/i2r/i2i). Each per-step
        # recurrent matmul is tiny, so scan overhead dominates on TPU: stack
        # (xr, xi) on the batch axis and run each LSTM once -> 2 scans with
        # doubled per-step matmuls (better MXU utilization, same math).
        batch = xr.shape[0]
        stacked = jnp.concatenate([xr, xi], axis=0)
        state_r, state_i = init_state if init_state is not None else (None, None)
        r_both, state_r = lstm_r(stacked, state_r)  # [Lr(xr); Lr(xi)]
        i_both, state_i = lstm_i(stacked, state_i)  # [Li(xr); Li(xi)]
        rr, ri = r_both[:batch], r_both[batch:]
        ir, ii = i_both[:batch], i_both[batch:]
        out_r = rr - ii
        out_i = ri + ir
        if self.projection_dim is not None:
            # Independent real projections per part (dccrn.py:295-297), not a
            # complex multiply.
            out_r = nn.Dense(self.projection_dim, dtype=self.dtype, name="proj_r")(out_r)
            out_i = nn.Dense(self.projection_dim, dtype=self.dtype, name="proj_i")(out_i)
            # XLA TPU miscompile workaround (v5e, observed at batch <= 4):
            # the projection's weight-gradient reduce gets a transpose from
            # the caller's layout shuffle folded into it post-optimization,
            # tripping the HLO verifier ("Expected instruction to have shape
            # equal to bf16[4,128], actual bf16[128,4]",
            # op clstm_1/proj_r/reduce_sum). The barrier stops the folding
            # on both the forward and transpose paths; the materialized
            # tensor is small ([B, T, C*D]).
            out_r, out_i = jax.lax.optimization_barrier((out_r, out_i))
        if self.return_state:
            return (out_r, out_i), (state_r, state_i)
        return out_r, out_i
