"""Resident-weight LSTM recurrence as a Pallas TPU kernel.

Why: the zoo's recurrent families (crn 1792-wide, rnn-stft-mask 896-wide
x3 bi, mel-rnn 256-wide; reference src/model/crn.py:88, conf lstm h=896,
mel_rnn.py:41-61) run their recurrence as ``lax.scan`` with the input
projection hoisted (ops/rnn.py). The step matmul [B, H] @ [H, 4H] has
arithmetic intensity B per weight element — at batch 16 the XLA while
loop re-streams w_hh from HBM every timestep, so the whole class sits at
0.2-0.8% MFU bounded by weight traffic, not math (docs/RESULTS.md §3b).

This kernel makes w_hh a grid-constant VMEM block: Pallas fetches it ONCE
(consecutive grid steps with an unchanged index map skip the re-DMA) and
the T sequential grid steps run the gate matmul + nonlinearities from
VMEM. HBM traffic per layer drops from T * |w_hh| to |w_hh| + the
unavoidable activation streams (x_proj in; h, c, gates out). v5e VMEM
comfortably holds the biggest zoo w_hh (crn: 1792x7168 bf16 = 25.7 MB;
the fused-attention kernel already ships vmem_limit_bytes=96 MB on this
chip).

The backward (custom VJP) is the same trick in reverse: w_hh^T resident,
grid walks t backward carrying (dh, dc) in scratch, emitting the
pre-activation gate cotangents; the weight/input-projection gradients are
then two big MXU matmuls OUTSIDE the kernel (dw_hh = h_prev^T dgates over
[T*B] — dense MXU work XLA handles well), so the kernel never needs a
[H, 4H] f32 accumulator live across steps.

Gate order follows torch (i, f, g, o) exactly like ops/rnn.py, so the
kernel is a drop-in for LSTMLayer (torch-weight parity preserved).
All-VMEM blocks, no manual DMA (axon faults on Pallas-issued DMA; see
ops/pallas/stft.py). f32 math for gates/cell state regardless of i/o
dtype; the MXU matmuls run in the i/o compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 * 1024 * 1024


def _split4(x, h):
    return x[:, :h], x[:, h:2 * h], x[:, 2 * h:3 * h], x[:, 3 * h:]


def _fwd_kernel(xp_ref, w_ref, h0_ref, c0_ref, hseq_ref, cseq_ref,
                gates_ref, hs, cs):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hs[:] = h0_ref[...].astype(jnp.float32)
        cs[:] = c0_ref[...].astype(jnp.float32)

    cdtype = xp_ref.dtype
    h_dim = hs.shape[-1]
    lin = xp_ref[0].astype(jnp.float32) + jnp.dot(
        hs[:].astype(cdtype), w_ref[...],
        preferred_element_type=jnp.float32)
    li, lf, lg, lo = _split4(lin, h_dim)
    i = jax.nn.sigmoid(li)
    f = jax.nn.sigmoid(lf)
    g = jnp.tanh(lg)
    o = jax.nn.sigmoid(lo)
    c = f * cs[:] + i * g
    h = o * jnp.tanh(c)
    hs[:] = h
    cs[:] = c
    hseq_ref[0] = h.astype(hseq_ref.dtype)
    cseq_ref[0] = c.astype(cseq_ref.dtype)
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(
        gates_ref.dtype)


def _bwd_kernel(gates_ref, c_ref, cprev_ref, dout_ref, wt_ref, dhT_ref,
                dcT_ref, dgates_ref, dh0_ref, dc0_ref, dhs, dcs):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhs[:] = dhT_ref[...].astype(jnp.float32)
        dcs[:] = dcT_ref[...].astype(jnp.float32)

    cdtype = dout_ref.dtype
    h_dim = dhs.shape[-1]
    i, f, g, o = _split4(gates_ref[0].astype(jnp.float32), h_dim)
    c = c_ref[0].astype(jnp.float32)
    c_prev = cprev_ref[0].astype(jnp.float32)
    tc = jnp.tanh(c)

    dh = dhs[:] + dout_ref[0].astype(jnp.float32)
    do = dh * tc
    dc = dcs[:] + dh * o * (1.0 - tc * tc)
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dgates = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f), dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)
    dhs[:] = jnp.dot(dgates.astype(cdtype), wt_ref[...],
                     preferred_element_type=jnp.float32)
    dcs[:] = dc * f

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dh0_ref[...] = dhs[:].astype(dh0_ref.dtype)
        dc0_ref[...] = dcs[:].astype(dc0_ref.dtype)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _lstm_fwd_call(x_proj, w_hh, h0, c0, reverse, interpret):
    seq, batch, gh = x_proj.shape
    h_dim = gh // 4
    # time index the grid step touches: the "first" step of a reversed
    # layer is t = T-1
    tmap = (lambda t: (seq - 1 - t, 0, 0)) if reverse else (
        lambda t: (t, 0, 0))
    seq_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (1, batch, width), tmap, memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda t: (0, 0), memory_space=pltpu.VMEM)
    h_seq, c_seq, gates = pl.pallas_call(
        _fwd_kernel,
        grid=(seq,),
        in_specs=[seq_spec(gh), const2(h_dim, gh), const2(batch, h_dim),
                  const2(batch, h_dim)],
        out_specs=(seq_spec(h_dim), seq_spec(h_dim), seq_spec(gh)),
        out_shape=(
            jax.ShapeDtypeStruct((seq, batch, h_dim), x_proj.dtype),
            jax.ShapeDtypeStruct((seq, batch, h_dim), x_proj.dtype),
            jax.ShapeDtypeStruct((seq, batch, gh), x_proj.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((batch, h_dim), jnp.float32),
                        pltpu.VMEM((batch, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_proj, w_hh, h0, c0)
    return h_seq, c_seq, gates


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _lstm_bwd_call(gates, c_seq, c_prev, dout, w_hh_t, dh_last, dc_last,
                   reverse, interpret):
    seq, batch, gh = gates.shape
    h_dim = gh // 4
    # backward walks the forward's visit order in reverse
    tmap = (lambda t: (t, 0, 0)) if reverse else (
        lambda t: (seq - 1 - t, 0, 0))
    seq_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (1, batch, width), tmap, memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec(  # noqa: E731
        (a, b), lambda t: (0, 0), memory_space=pltpu.VMEM)
    dgates, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(seq,),
        in_specs=[seq_spec(gh), seq_spec(h_dim), seq_spec(h_dim),
                  seq_spec(h_dim), const2(gh, h_dim), const2(batch, h_dim),
                  const2(batch, h_dim)],
        out_specs=(seq_spec(gh), const2(batch, h_dim),
                   const2(batch, h_dim)),
        out_shape=(
            jax.ShapeDtypeStruct((seq, batch, gh), gates.dtype),
            jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, h_dim), jnp.float32),
                        pltpu.VMEM((batch, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(gates, c_seq, c_prev, dout, w_hh_t, dh_last, dc_last)
    return dgates, dh0, dc0


def _shift_prev(seq_arr, first, reverse):
    """Per-step "previous" carry values along time.

    Forward layer: prev of t is t-1 (t=0 -> initial). Reversed layer
    (scan runs T-1 -> 0): prev of t is t+1 (t=T-1 -> initial).
    """
    if reverse:
        return jnp.concatenate([seq_arr[1:], first[None]], axis=0)
    return jnp.concatenate([first[None], seq_arr[:-1]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_lstm(x_proj, w_hh, h0, c0, reverse: bool = False,
               interpret: bool = False):
    """LSTM recurrence over pre-projected inputs, weights resident in VMEM.

    Args: x_proj [T, B, 4H] = x @ w_ih + bias (time-major, torch gate
    order i,f,g,o), w_hh [H, 4H], h0/c0 [B, H]. Returns (h_seq [T, B, H]
    in time order, h_last, c_last). Semantically identical to the
    ``lax.scan`` body in ops/rnn.py:LSTMLayer (f32 gate math, carry in
    f32); exact custom VJP below.
    """
    h_seq, c_seq, _ = _lstm_fwd_call(x_proj, w_hh, h0, c0, reverse,
                                     interpret)
    edge = 0 if reverse else -1
    return h_seq, h_seq[edge], c_seq[edge]


def _fused_lstm_fwd(x_proj, w_hh, h0, c0, reverse, interpret):
    h_seq, c_seq, gates = _lstm_fwd_call(x_proj, w_hh, h0, c0, reverse,
                                         interpret)
    edge = 0 if reverse else -1
    out = (h_seq, h_seq[edge], c_seq[edge])
    return out, (x_proj, w_hh, h0, c0, h_seq, c_seq, gates)


def _fused_lstm_bwd(reverse, interpret, res, cts):
    x_proj, w_hh, h0, c0, h_seq, c_seq, gates = res
    d_hseq, d_hlast, d_clast = cts
    edge = 0 if reverse else -1
    # h_last is h_seq[edge]: fold its cotangent into the sequence stream
    d_hseq = d_hseq.at[edge].add(d_hlast.astype(d_hseq.dtype))
    c_prev = _shift_prev(c_seq, c0.astype(c_seq.dtype), reverse)
    dgates, dh0, dc0 = _lstm_bwd_call(
        gates, c_seq, c_prev, d_hseq, jnp.swapaxes(w_hh, 0, 1),
        jnp.zeros_like(h0, jnp.float32),
        d_clast.astype(jnp.float32), reverse, interpret)
    h_prev = _shift_prev(h_seq, h0.astype(h_seq.dtype), reverse)
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dgates,
                       preferred_element_type=jnp.float32)
    return (dgates.astype(x_proj.dtype), dw_hh.astype(w_hh.dtype),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


fused_lstm.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)
