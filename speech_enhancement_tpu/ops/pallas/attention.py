"""Fused multi-head attention for short sequences as a Pallas TPU kernel.

Sepformer's dual-path transformers attend over short sequences (intra
chunks K=250, inter chunks S~64; reference sepformer.py:558-654) but at
huge batch (B*chunks ~ 1024 at batch 16), so the XLA path materializes
[B', H, L, L] score/probability tensors in HBM every layer — the profile
shows the batch-16 train step moving ~1.1 TB/step, 80% of the v5e HBM
roofline (NOTES_DEV.md round-3 log). At these lengths the ENTIRE
attention matrix for one (batch, head) fits VMEM, so no flash-style
streaming is needed: one kernel per (b, h) grid cell computes
QK^T -> masked f32 softmax -> @V entirely in VMEM and writes only the
per-head output. The backward (custom VJP) recomputes scores/probs in
VMEM and emits dq/dk/dv in a single fused kernel — the [L, L] tensors
never exist in HBM in either direction.

Layout: all HBM arrays are PACKED [B, H*D, L] (sequence minor, heads*dim
in sublanes; the grid slices one head's [D, L] block per cell via the
BlockSpec index map). Any array with head_dim (32) minor would be
physically padded to 128 lanes by the TPU's tiled HBM layout — a measured
4x expansion ("Extra memory due to padding: 750M (4.0x)" in the OOM
report) that blew the remat'd sepformer backward to 34-48 GB. Packed,
the only pad is L 250 -> 256 (~2%) inside the call.

All-VMEM blocks, no manual DMA (axon faults on Pallas-issued DMA; see
ops/pallas/stft.py). f32 math inside the kernel regardless of the i/o
dtype (Mosaic reductions are 32-bit; bf16 i/o halves remaining traffic).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(value: int, mult: int) -> int:
    return -(-value // mult) * mult


def _probs(qt, kt, scale: float, length: int):
    """f32 attention probabilities [G, Lq, Lk] from [G, D, L] VMEM blocks."""
    s = jax.lax.dot_general(qt, kt, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < length, s, -1e30)  # mask padded keys
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, length):
    # blocks are [G, D, L]: G sequences per grid cell amortize the per-cell
    # issue overhead (one (b,h) per cell measured 2.35 s/step at sepformer
    # batch 16 — the cell count, not the math, dominated)
    qt = q_ref[...].astype(jnp.float32)
    kt = k_ref[...].astype(jnp.float32)
    vt = v_ref[...].astype(jnp.float32)
    p = _probs(qt, kt, scale, length)
    # o^T[g, d, l] = sum_m v^T[g, d, m] p[g, l, m]
    ot = jax.lax.dot_general(vt, p, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o_ref[...] = ot.astype(o_ref.dtype)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                    scale, length):
    qt = q_ref[...].astype(jnp.float32)
    kt = k_ref[...].astype(jnp.float32)
    vt = v_ref[...].astype(jnp.float32)
    gt = g_ref[...].astype(jnp.float32)  # [G, D, Lq] output cotangent
    p = _probs(qt, kt, scale, length)
    # dv^T[g, d, m] = sum_l g^T[g, d, l] p[g, l, m]
    dvt = jax.lax.dot_general(gt, p, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    # dp[g, l, m] = sum_d g^T[g, d, l] v^T[g, d, m]
    dp = jax.lax.dot_general(gt, vt, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # softmax vjp: ds = p * (dp - rowsum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=2, keepdims=True))
    # dq^T[g, d, l] = sum_m ds[g, l, m] k^T[g, d, m] * scale
    dqt = jax.lax.dot_general(kt, ds, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32) * scale
    # dk^T[g, d, m] = sum_l ds[g, l, m] q^T[g, d, l] * scale
    dkt = jax.lax.dot_general(qt, ds, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32) * scale
    dq_ref[...] = dqt.astype(dq_ref.dtype)
    dk_ref[...] = dkt.astype(dk_ref.dtype)
    dv_ref[...] = dvt.astype(dv_ref.dtype)


def _pad_l(x, lp):
    pad = lp - x.shape[-1]
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad else x


def _group(batch: int) -> int:
    """Sequences per grid cell: largest of 16/8/4/2/1 dividing the batch.

    16 amortizes per-cell issue overhead best (measured ladder at
    sepformer batch 16: G=1 2352 -> G=8 1334 ms/step); the backward's
    three [G, L, L] f32 VMEM tensors then need ~12.6 MB, which is why
    the pallas_calls raise vmem_limit_bytes above the 16 MB default.
    """
    for g in (16, 8, 4, 2, 1):
        if batch % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _mha_fwd_call(q, k, v, heads, scale, interpret):
    batch, hd, length = q.shape
    depth = hd // heads
    lp = _round_up(length, 128)
    qp, kp, vp = (_pad_l(x, lp) for x in (q, k, v))
    g_seq = _group(batch)
    spec = pl.BlockSpec((g_seq, depth, lp), lambda b, h: (b, h, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_fwd_kernel, scale=scale, length=length),
        grid=(batch // g_seq, heads),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp)
    return out[..., :length]


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _mha_bwd_call(q, k, v, g, heads, scale, interpret):
    batch, hd, length = q.shape
    depth = hd // heads
    lp = _round_up(length, 128)
    qp, kp, vp, gp = (_pad_l(x, lp) for x in (q, k, v, g))
    g_seq = _group(batch)
    spec = pl.BlockSpec((g_seq, depth, lp), lambda b, h: (b, h, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct(qp.shape, q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, scale=scale, length=length),
        grid=(batch // g_seq, heads),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, gp)
    return dq[..., :length], dk[..., :length], dv[..., :length]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mha_packed(q, k, v, heads: int, scale: float = 0.0,
                     interpret: bool = False):
    """Attention over packed [B, H*D, L] arrays (dim 1 = h*D + d).

    Every HBM array involved keeps L minor (no tiled-layout padding).
    ``scale`` 0.0 means the standard 1/sqrt(D). Exact custom VJP.
    """
    scale = scale or 1.0 / math.sqrt(q.shape[1] // heads)
    return _mha_fwd_call(q, k, v, heads, scale, interpret)


def _fused_packed_fwd(q, k, v, heads, scale, interpret):
    scale = scale or 1.0 / math.sqrt(q.shape[1] // heads)
    return _mha_fwd_call(q, k, v, heads, scale, interpret), (q, k, v)


def _fused_packed_bwd(heads, scale, interpret, res, g):
    q, k, v = res
    scale = scale or 1.0 / math.sqrt(q.shape[1] // heads)
    return _mha_bwd_call(q, k, v, g, heads, scale, interpret)


fused_mha_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_mha(q, k, v, scale: float = 0.0, interpret: bool = False):
    """[B, H, L, D]-interface adapter over :func:`fused_mha_packed`.

    Prefer the packed form in models — this adapter's transposes create
    [.., D]-minor intermediates that the tiled HBM layout pads 4x.
    """
    b, h, l, d = q.shape
    pack = lambda x: jnp.swapaxes(x, 2, 3).reshape(b, h * d, l)  # noqa: E731
    out = fused_mha_packed(pack(q), pack(k), pack(v), h, scale, interpret)
    return jnp.swapaxes(out.reshape(b, h, d, l), 2, 3)
