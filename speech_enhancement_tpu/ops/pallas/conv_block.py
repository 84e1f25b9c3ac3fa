"""Fused DCCRN complex-conv block kernels (Pallas TPU).

Why: round-2 profiling put the DCCRN train step at 63-65 ms with
elementwise fusions (25.6 ms) + layout-conversion copies (16.1 ms) = 2/3 of
the step, while XLA's own cost analysis counts only ~2.9 GB of logical
traffic — 45 GB/s implied, 5.5% of v5e HBM peak (tools/bench_batch_sweep.py).
The step is not HBM-bound; it is bound by XLA's conv layout choices: NHWC
complex convs with 2..32 channels use 2..32 of 128 lanes, so elementwise
passes and layout conversions move up to 64x padding.

These kernels own the layout. Every inter-block activation is a raw conv
output stored [B, R=F*C2, T]: TIME in lanes (>= 512 for 4 s audio, always
full), frequency-major/channel-minor rows in sublanes (channels stacked
[r..., i...] per frequency, matching the block-matrix kernel's channel
order). One kernel per block computes

    z = PReLU(CBN_apply(x))      (folded per-channel coeffs, in VMEM)
    y = complex_conv(z) + bias   (k=(5,2), s=(2,1), causal time)

so the only HBM tensors between blocks are the conv outputs themselves.

The (f, c)-flattened rows make the conv a row-span matmul: the 5 freq taps
x C2in channels of one output row are CONTIGUOUS rows of z, so

    y[fo] = sum_{jt in 0,1} W_jt[5*C2in, C2out]^T @ z_span(fo)[:, jt-shift]

— two MXU calls per output row, no im2col tensor, freq boundaries as zero
row-groups in the scratch, the causal time tap as a leading zero lane
column. The decoder (stride-2 transposed conv + complex-cat skip join,
models/dccrn.py:399-404) splits each tap matmul into an x-part and a
skip-part against two scratch regions, so the channel concat never exists
anywhere — not even in VMEM.

Training-mode CBN batch statistics are emitted per batch item as partial
sums ([B, 8, C]); XLA reduces those vectors and folds coefficients between
kernels (fold_cbn_coeffs / stats_from_partials). Parameters are identical
to the XLA path (models/dccrn.py _ComplexConvBlock) — this is an execution
strategy, not a new model.

Reference semantics: src/model/dccrn.py:316-450 (complex conv/deconv with
causal pad + chomp), 457-634 (ComplexBatchNorm; folding identical to
ops/complex_ops.py _folded), 65-137 (PReLU). All-VMEM blocks, no manual
DMA (the axon runtime faults on Pallas DMA, NOTES_DEV.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# host-side helpers: coefficient folding, stats reduction (vector math)
# --------------------------------------------------------------------------

def fold_cbn_coeffs(params: dict, stats: dict, eps: float = 1e-5):
    """(whitening o affine) folded to stacked per-channel coefficients.

    Same math as ComplexBatchNorm._folded (ops/complex_ops.py:199-274):
    returns (a_diag[C2], a_cross[C2], c0[C2]) over stacked [r..., i...]
    channels such that  z[ch] = a_diag[ch]*x[ch] + a_cross[ch]*x[partner]
    + c0[ch].
    """
    vrr = stats["vrr"] + eps
    vii = stats["vii"] + eps
    vri = stats["vri"]
    det = vrr * vii - vri * vri
    s = jnp.sqrt(jnp.maximum(det, 1e-12))
    t = jnp.sqrt(vrr + vii + 2.0 * s)
    inv_st = 1.0 / (s * t)
    wrr = (vii + s) * inv_st
    wii = (vrr + s) * inv_st
    wri = -vri * inv_st

    gamma_rr, gamma_ii = params["gamma_rr"], params["gamma_ii"]
    gamma_ri = params["gamma_ri"]
    arr = gamma_rr * wrr + gamma_ri * wri
    ari = gamma_rr * wri + gamma_ri * wii
    air = gamma_ri * wrr + gamma_ii * wri
    aii = gamma_ri * wri + gamma_ii * wii
    mean_r, mean_i = stats["mean_r"], stats["mean_i"]
    cr0 = params["beta_r"] - (arr * mean_r + ari * mean_i)
    ci0 = params["beta_i"] - (air * mean_r + aii * mean_i)

    a_diag = jnp.concatenate([arr, aii])
    a_cross = jnp.concatenate([ari, air])
    c0 = jnp.concatenate([cr0, ci0])
    return a_diag, a_cross, c0


def identity_coeffs(c2: int, dtype=jnp.float32):
    """Pass-through pointwise (spectrogram input / LSTM-output input)."""
    return (jnp.ones((c2,), dtype), jnp.zeros((c2,), dtype),
            jnp.zeros((c2,), dtype))


def stats_from_partials(partials: jnp.ndarray, n_per_channel: int):
    """[B, 8, C] kernel partial sums -> CBN batch stats dict.

    Rows 0..4 are sum_r, sum_i, sum_rr, sum_ii, sum_ri over (F_out, T) per
    complex channel; n_per_channel = B * F_out * T. Variances use the
    one-pass E[x^2]-E[x]^2 form exactly like ComplexBatchNorm._folded.
    """
    total = jnp.sum(partials.astype(jnp.float32), axis=0)  # [8, C]
    inv_n = 1.0 / float(n_per_channel)
    mean_r = total[0] * inv_n
    mean_i = total[1] * inv_n
    vrr = jnp.maximum(total[2] * inv_n - mean_r * mean_r, 0.0)
    vii = jnp.maximum(total[3] * inv_n - mean_i * mean_i, 0.0)
    vri = total[4] * inv_n - mean_r * mean_i
    return {"mean_r": mean_r, "mean_i": mean_i, "vrr": vrr, "vii": vii,
            "vri": vri}


# --------------------------------------------------------------------------
# in-kernel pointwise: z = PReLU(a_diag*x + a_cross*partner(x) + c0)
# --------------------------------------------------------------------------

def _pointwise(x, coef, mask, alpha, c: int):
    """x: [R, T]; coef: [3, R, 1] tiled per-row coeffs; mask: [R, 1] 1.0 on
    r-half rows; c = channels per complex part. partner(row) = row +- c
    inside each frequency group — uniform rolls selected by the half mask
    (wrapped lanes are never selected: row < c is always an r-half row)."""
    rows = x.shape[0]
    partner = jnp.where(
        mask > 0.5,
        pltpu.roll(x, rows - c, axis=0),  # == roll by -c
        pltpu.roll(x, c, axis=0),
    )
    z = coef[0] * x + coef[1] * partner + coef[2]
    return jnp.where(z >= 0, z, alpha * z)


def _pointwise_ref(x, a_diag, a_cross, c0, alpha):
    """Pure-jnp reference of the folded pointwise for [B, F, C2, T] arrays
    (used by tests and by the XLA fallback path)."""
    c = x.shape[2] // 2
    xr, xi = x[:, :, :c], x[:, :, c:]
    d, k, b = (v.reshape(2, c, 1) for v in (a_diag, a_cross, c0))
    zr = d[0] * xr + k[0] * xi + b[0]
    zi = d[1] * xi + k[1] * xr + b[1]
    z = jnp.concatenate([zr, zi], axis=2)
    return jnp.where(z >= 0, z, alpha * z)


def _stats_rows(acc, c2out: int):
    """Per-channel partial sums from one output row: [5, C] f32."""
    c = c2out // 2
    yr = acc[0:c]
    yi = acc[c:c2out]
    return jnp.stack([
        jnp.sum(yr, axis=-1),
        jnp.sum(yi, axis=-1),
        jnp.sum(yr * yr, axis=-1),
        jnp.sum(yi * yi, axis=-1),
        jnp.sum(yr * yi, axis=-1),
    ])


def _matmul(w, rhs):
    return jax.lax.dot_general(
        w, rhs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# encoder kernel: strided conv, k=(5,2) s=(2,1), causal time pad
# --------------------------------------------------------------------------

def _enc_kernel(x_ref, w_ref, b_ref, coef_ref, mask_ref, alpha_ref,
                y_ref, stats_ref, z_scr, *,
                f_in, f_out, c2in, c2out, n_time, with_stats):
    c = c2in // 2
    x = x_ref[0]
    z = _pointwise(x, coef_ref[...], mask_ref[...], alpha_ref[0, 0], c)
    # scratch layout: [ (F+4)*C2in rows , T+1 lanes ]; 2 zero freq groups on
    # each side; lane 0 is the causal zero column (x[t-1] at t=0).
    pad_rows = 2 * c2in
    z_scr[...] = jnp.zeros(z_scr.shape, z_scr.dtype)
    z_scr[pl.ds(pad_rows, f_in * c2in), pl.ds(1, n_time)] = z
    bias = b_ref[...]  # [C2outp, 1]
    if with_stats:
        stat_acc = jnp.zeros((5, c2out // 2), jnp.float32)
    span = 5 * c2in
    for fo in range(f_out):
        r0 = 2 * fo * c2in  # group (2*fo - 2) + 2 pad groups
        # y[fo, t] = sum_jt W_jt^T z[2fo+jf-2, t+jt-1]  (correlation, causal)
        acc = _matmul(w_ref[0], z_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        acc += _matmul(w_ref[1], z_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc = acc[:c2out] + bias[:c2out]
        y_ref[0, pl.ds(fo * c2out, c2out), :] = acc.astype(y_ref.dtype)
        if with_stats:
            stat_acc = stat_acc + _stats_rows(acc, c2out)
    if with_stats:
        stats_ref[0, 0:5] = stat_acc
        stats_ref[0, 5:8] = jnp.zeros((3, c2out // 2), jnp.float32)


# --------------------------------------------------------------------------
# decoder kernel: transposed conv (stride 2, crop [2:-1] freq / [1:] time)
# with the complex-cat skip join assembled implicitly via split weights
# --------------------------------------------------------------------------

def _dec_kernel(x_ref, s_ref, we_x_ref, we_s_ref, wo_x_ref, wo_s_ref, b_ref,
                coef_x_ref, mask_x_ref, alpha_x_ref,
                coef_s_ref, mask_s_ref, alpha_s_ref,
                y_ref, stats_ref, zx_scr, zs_scr, *,
                f_in, f_out, c2x, c2s, c2out, n_time, with_stats):
    """y[fo, to] = sum_{jf: fo+jf even} sum_jt k[jf, jt] z[(fo+jf-2)/2, to+jt]

    (lax.conv_transpose VALID, stride (2,1), then y[2:-1] freq crop and
    [1:] time chomp — models/dccrn.py:218-229). Channel order of the joined
    input is [xr, skip_r, xi, skip_i]; instead of concatenating, each tap
    matmul is split into an x-part and a skip-part with weight rows
    reordered to match (the contraction is permutation-invariant).
    """
    cx = c2x // 2
    cs = c2s // 2
    zx = _pointwise(x_ref[0], coef_x_ref[...], mask_x_ref[...],
                    alpha_x_ref[0, 0], cx)
    zs = _pointwise(s_ref[0], coef_s_ref[...], mask_s_ref[...],
                    alpha_s_ref[0, 0], cs)
    # scratch: 1 zero freq group each side; lane 0 zero; lane T+1 absent —
    # the jt=1 tap's final column (z[F..]) is handled by a trailing zero
    # lane column instead: [.., T+2] with both lane 0 and lane T+1 zero.
    zx_scr[...] = jnp.zeros(zx_scr.shape, zx_scr.dtype)
    zs_scr[...] = jnp.zeros(zs_scr.shape, zs_scr.dtype)
    zx_scr[pl.ds(c2x, f_in * c2x), pl.ds(1, n_time)] = zx
    zs_scr[pl.ds(c2s, f_in * c2s), pl.ds(1, n_time)] = zs
    bias = b_ref[...]
    if with_stats:
        stat_acc = jnp.zeros((5, c2out // 2), jnp.float32)
    for fo in range(f_out):
        if fo % 2 == 0:
            fi0 = fo // 2
            rx, rs = fi0 * c2x, fi0 * c2s  # group (fi0 - 1) + 1 pad group
            span_x, span_s = 3 * c2x, 3 * c2s
            wx, ws = we_x_ref, we_s_ref
        else:
            fi0 = (fo - 1) // 2
            rx, rs = (fi0 + 1) * c2x, (fi0 + 1) * c2s
            span_x, span_s = 2 * c2x, 2 * c2s
            wx, ws = wo_x_ref, wo_s_ref
        # jt = 0 -> z[.., to] (scratch lane to+1);  jt = 1 -> z[.., to+1]
        acc = _matmul(wx[0], zx_scr[pl.ds(rx, span_x), pl.ds(1, n_time)])
        acc += _matmul(wx[1], zx_scr[pl.ds(rx, span_x), pl.ds(2, n_time)])
        acc += _matmul(ws[0], zs_scr[pl.ds(rs, span_s), pl.ds(1, n_time)])
        acc += _matmul(ws[1], zs_scr[pl.ds(rs, span_s), pl.ds(2, n_time)])
        acc = acc[:c2out] + bias[:c2out]
        y_ref[0, pl.ds(fo * c2out, c2out), :] = acc.astype(y_ref.dtype)
        if with_stats:
            stat_acc = stat_acc + _stats_rows(acc, c2out)
    if with_stats:
        stats_ref[0, 0:5] = stat_acc
        stats_ref[0, 5:8] = jnp.zeros((3, c2out // 2), jnp.float32)


# --------------------------------------------------------------------------
# host wrappers
# --------------------------------------------------------------------------

def _tile_coeffs(a_diag, a_cross, c0, f: int, c2: int, dtype):
    """Per-channel [C2] coeffs -> [3, F*C2, 1] row-tiled columns."""
    coef = jnp.stack([a_diag, a_cross, c0]).astype(dtype)  # [3, C2]
    return jnp.tile(coef, (1, f))[:, :, None]


def _half_mask(f: int, c2: int):
    c = c2 // 2
    group = jnp.concatenate([jnp.ones((c,)), jnp.zeros((c,))])
    return jnp.tile(group, (f,))[:, None].astype(jnp.float32)


def _enc_weights(w2: jnp.ndarray, dtype):
    """[5, 2, C2in, C2out] -> [2, 5*C2in, C2out] (jf-major row order)."""
    kh, kw, c2in, c2out = w2.shape
    return jnp.transpose(w2, (1, 0, 2, 3)).reshape(kw, kh * c2in, c2out).astype(dtype)


def _dec_weights(w2: jnp.ndarray, c2x: int, c2s: int, dtype):
    """Split + reorder decoder weights for the two-region tap matmuls.

    w2: [5, 2, C2x + C2s, C2out] with input-channel order
    [xr(cx), sr(cs), xi(cx), si(cs)] (the complex-cat join). Returns
    (we_x [2, 3*C2x, C2out], we_s, wo_x [2, 2*C2x, C2out], wo_s) where the
    "even" matrices stack jf = 0, 2, 4 (ascending z rows) and the "odd"
    ones jf = 1, 3; each is restricted to its region's rows, reordered to
    the region's own [r..., i...] row order.
    """
    cx, cs = c2x // 2, c2s // 2
    x_rows = jnp.concatenate([
        jnp.arange(0, cx), jnp.arange(cx + cs, 2 * cx + cs)
    ])
    s_rows = jnp.concatenate([
        jnp.arange(cx, cx + cs), jnp.arange(2 * cx + cs, 2 * cx + 2 * cs)
    ])
    wx = w2[:, :, x_rows, :]  # [5, 2, C2x, C2out]
    ws = w2[:, :, s_rows, :]

    def stack(w, taps):
        # ascending z rows == ascending jf within the parity class
        parts = [w[jf] for jf in taps]  # each [2, C2r, C2out]
        return jnp.concatenate(parts, axis=1).astype(dtype)  # [2, n*C2r, C2out]

    return (stack(wx, (0, 2, 4)), stack(ws, (0, 2, 4)),
            stack(wx, (1, 3)), stack(ws, (1, 3)))


@functools.partial(
    jax.jit, static_argnames=("f_in", "c2in", "c2out", "with_stats", "interpret")
)
def fused_conv_block(x, w2, b2, a_diag, a_cross, c0, alpha, *,
                     f_in: int, c2in: int, c2out: int,
                     with_stats: bool = False, interpret: bool = False):
    """PReLU(CBN_apply(x)) -> complex conv, one Pallas pass per batch item.

    x: [B, f_in*c2in, T] flattened raw conv output (or spectrogram);
    w2: [5, 2, c2in, c2out] block-matrix kernel; b2: [c2out];
    (a_diag, a_cross, c0): folded coeffs for the INPUT channels (identity
    for the first block); alpha: input PReLU scalar (1.0 = identity).
    Returns y [B, (f_in//2)*c2out, T] (+ stats [B, 8, c2out//2]).
    """
    batch, rows, n_time = x.shape
    assert rows == f_in * c2in, (rows, f_in, c2in)
    f_out = f_in // 2
    w = _enc_weights(w2, x.dtype)
    bias = jnp.asarray(b2, jnp.float32)[:, None]
    coef = _tile_coeffs(a_diag, a_cross, c0, f_in, c2in, x.dtype)
    mask = _half_mask(f_in, c2in)
    alpha = jnp.asarray(alpha, x.dtype).reshape(1, 1)

    kernel = functools.partial(
        _enc_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time, with_stats=with_stats,
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, rows, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(coef.shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mask.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c2out // 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f_out * c2out, n_time), x.dtype),
            jax.ShapeDtypeStruct((batch, 8, c2out // 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 4) * c2in, n_time + 1), x.dtype)
        ],
        interpret=interpret,
    )(x, w, bias, coef, mask, alpha)
    if with_stats:
        return y, stats
    return y


@functools.partial(
    jax.jit,
    static_argnames=("f_in", "c2x", "c2s", "c2out", "with_stats", "interpret"),
)
def fused_deconv_block(x, skip, w2, b2, coef_x, alpha_x, coef_s, alpha_s, *,
                       f_in: int, c2x: int, c2s: int, c2out: int,
                       with_stats: bool = False, interpret: bool = False):
    """Decoder block: in-VMEM skip join + stride-2 transposed complex conv.

    x: [B, f_in*c2x, T]; skip: [B, f_in*c2s, T]; w2: [5, 2, c2x+c2s, c2out]
    with joined input-channel order [xr, sr, xi, si]; coef_x / coef_s:
    (a_diag, a_cross, c0) tuples for each input. Returns
    y [B, (2*f_in)*c2out, T] (+ stats [B, 8, c2out//2]).
    """
    batch, rows_x, n_time = x.shape
    assert rows_x == f_in * c2x
    f_out = 2 * f_in
    we_x, we_s, wo_x, wo_s = _dec_weights(w2, c2x, c2s, x.dtype)
    bias = jnp.asarray(b2, jnp.float32)[:, None]
    cfx = _tile_coeffs(*coef_x, f_in, c2x, x.dtype)
    cfs = _tile_coeffs(*coef_s, f_in, c2s, x.dtype)
    mx = _half_mask(f_in, c2x)
    ms = _half_mask(f_in, c2s)
    ax = jnp.asarray(alpha_x, x.dtype).reshape(1, 1)
    a_s = jnp.asarray(alpha_s, x.dtype).reshape(1, 1)

    kernel = functools.partial(
        _dec_kernel, f_in=f_in, f_out=f_out, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time, with_stats=with_stats,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    y, stats = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, rows_x, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_in * c2s, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full, full, full, full, full, full,
        ],
        out_specs=(
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c2out // 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f_out * c2out, n_time), x.dtype),
            jax.ShapeDtypeStruct((batch, 8, c2out // 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 2) * c2x, n_time + 2), x.dtype),
            pltpu.VMEM(((f_in + 2) * c2s, n_time + 2), x.dtype),
        ],
        interpret=interpret,
    )(x, skip, we_x, we_s, wo_x, wo_s, bias,
      cfx, mx, ax, cfs, ms, a_s)
    if with_stats:
        return y, stats
    return y


# ==========================================================================
# training: custom VJP
# ==========================================================================
#
# The train-mode ops below give the fused blocks exact gradients. Only the
# conv/deconv input- and weight-gradients run as Pallas kernels (they are
# the ops whose XLA layouts caused the round-2 slowdown); the pointwise
# backward (PReLU/CBN-apply) and all per-channel reductions stay in XLA,
# which is lane-efficient in the [B, R, T] layout. Crucially, the
# stats -> coefficients -> next-block chain (fold_cbn_coeffs /
# stats_from_partials) is ordinary traced code OUTSIDE these ops, so the
# full complex-BN backward (gradients through the batch moments) composes
# automatically from this op's VJP for (y, stats_partials) w.r.t.
# (x, w2, b2, a_diag, a_cross, c0, alpha).


def _enc_bwd_weights(w2: jnp.ndarray, dtype):
    """Transposed-conv weight stacks for the encoder input-gradient.

    g_z[fi] = sum_{jf: fi+2-jf even} W[jf]^T g_y[(fi+2-jf)/2] — ascending
    g_y rows correspond to descending jf, so:
      even fi: lhs [2(jt), 3*C2out, C2in] stacking jf = 4, 2, 0
      odd  fi: lhs [2(jt), 2*C2out, C2in] stacking jf = 3, 1
    """
    wt = jnp.transpose(w2, (0, 1, 3, 2))  # [5, 2, C2out, C2in]

    def stack(taps):
        return jnp.concatenate([wt[jf] for jf in taps], axis=1).astype(dtype)

    return stack((4, 2, 0)), stack((3, 1))


def _enc_bwd_gz_kernel(gy_ref, we_ref, wo_ref, gz_ref, gy_scr, *,
                       f_in, f_out, c2in, c2out, n_time):
    """g_z = conv^T(g_y) for the stride-(2,1) causal encoder conv.

    Time: y[to] consumed z[to + jt - 1]  =>  g_z[ti] += W_jt^T g_y[ti-jt+1];
    scratch holds g_y at lane cols [1..T] with cols 0 and T+1 zero, so the
    jt tap reads cols [2-jt, 2-jt+T).
    """
    gy_scr[...] = jnp.zeros(gy_scr.shape, gy_scr.dtype)
    gy_scr[pl.ds(c2out, f_out * c2out), pl.ds(1, n_time)] = gy_ref[0]
    for fi in range(f_in):
        if fi % 2 == 0:
            r0 = (fi // 2) * c2out  # group (fi/2 - 1) + 1 pad group
            span, w = 3 * c2out, we_ref
        else:
            r0 = ((fi - 1) // 2 + 1) * c2out
            span, w = 2 * c2out, wo_ref
        acc = _matmul(w[0], gy_scr[pl.ds(r0, span), pl.ds(2, n_time)])
        acc += _matmul(w[1], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        gz_ref[0, pl.ds(fi * c2in, c2in), :] = acc[:c2in].astype(gz_ref.dtype)


def _enc_bwd_dw_kernel(z_ref, gy_ref, dw_ref, z_scr, *,
                       f_in, f_out, c2in, c2out, n_time):
    """dW_jt[5*C2in, C2out] += z_span(fo)[:, jt-shift] @ g_y[fo]^T.

    Contraction over the lane (time) axis; f32 accumulation directly in the
    output VMEM block (one per batch item, summed over B by the caller).
    """
    z_scr[...] = jnp.zeros(z_scr.shape, z_scr.dtype)
    z_scr[pl.ds(2 * c2in, f_in * c2in), pl.ds(1, n_time)] = z_ref[0]
    span = 5 * c2in
    dw_ref[0] = jnp.zeros(dw_ref.shape[1:], dw_ref.dtype)
    for fo in range(f_out):
        r0 = 2 * fo * c2in
        gy = gy_ref[0, pl.ds(fo * c2out, c2out), :]  # [C2out, T]
        for jt in range(2):
            zs = z_scr[pl.ds(r0, span), pl.ds(jt, n_time)]
            contrib = jax.lax.dot_general(
                zs, gy, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [span, C2out]
            dw_ref[0, jt] += contrib


def _dec_bwd_weights(w2: jnp.ndarray, c2x: int, c2s: int, dtype):
    """Input-gradient stacks for the stride-2 transposed conv.

    g_z[fi] = sum_{jf, jt} k[jf, jt]^T g_y[2fi + 2 - jf] (ascending g_y rows
    <=> descending jf; all 5 jf valid per fi), split into x-region and
    skip-region output columns.
    """
    cx, cs = c2x // 2, c2s // 2
    x_rows = jnp.concatenate([
        jnp.arange(0, cx), jnp.arange(cx + cs, 2 * cx + cs)])
    s_rows = jnp.concatenate([
        jnp.arange(cx, cx + cs), jnp.arange(2 * cx + cs, 2 * cx + 2 * cs)])
    wt = jnp.transpose(w2, (0, 1, 3, 2))  # [5, 2, C2out, C2j]

    def stack(rows):
        parts = [wt[jf][:, :, rows] for jf in (4, 3, 2, 1, 0)]
        return jnp.concatenate(parts, axis=1).astype(dtype)  # [2, 5*C2out, C2r]

    return stack(x_rows), stack(s_rows)


def _dec_bwd_gz_kernel(gy_ref, wx_ref, ws_ref, gzx_ref, gzs_ref, gy_scr, *,
                       f_in, c2x, c2s, c2out, n_time):
    """Input gradients of the decoder block for both joined regions.

    Time: y[to] consumed z[to + jt]  =>  g_z[ti] += k_jt^T g_y[ti - jt];
    scratch cols [1..T] hold g_y, col 0 zero, so the jt tap reads cols
    [1-jt, 1-jt+T).
    """
    f_out = 2 * f_in
    gy_scr[...] = jnp.zeros(gy_scr.shape, gy_scr.dtype)
    gy_scr[pl.ds(2 * c2out, f_out * c2out), pl.ds(1, n_time)] = gy_ref[0]
    span = 5 * c2out
    for fi in range(f_in):
        r0 = 2 * fi * c2out  # group (2fi - 2) + 2 pad groups
        acc_x = _matmul(wx_ref[0], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc_x += _matmul(wx_ref[1], gy_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        acc_s = _matmul(ws_ref[0], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc_s += _matmul(ws_ref[1], gy_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        gzx_ref[0, pl.ds(fi * c2x, c2x), :] = acc_x[:c2x].astype(gzx_ref.dtype)
        gzs_ref[0, pl.ds(fi * c2s, c2s), :] = acc_s[:c2s].astype(gzs_ref.dtype)


def _dec_bwd_dw_kernel(zx_ref, zs_ref, gy_ref, dwx_ref, dws_ref,
                       zx_scr, zs_scr, *,
                       f_in, c2x, c2s, c2out, n_time):
    """Weight gradients of the decoder block, per joined region.

    dK[jf, jt][cr, co] = sum_{fi, to} z[fi, cr, to + jt] g_y[2fi+2-jf, co, to]
    with out-of-range g_y groups dropped statically. Scratch holds z at
    cols [0..T) with col T zero (the jt=1 tap's final column).
    """
    f_out = 2 * f_in
    zx_scr[...] = jnp.zeros(zx_scr.shape, zx_scr.dtype)
    zs_scr[...] = jnp.zeros(zs_scr.shape, zs_scr.dtype)
    zx_scr[pl.ds(0, f_in * c2x), pl.ds(0, n_time)] = zx_ref[0]
    zs_scr[pl.ds(0, f_in * c2s), pl.ds(0, n_time)] = zs_ref[0]
    dwx_ref[0] = jnp.zeros(dwx_ref.shape[1:], dwx_ref.dtype)
    dws_ref[0] = jnp.zeros(dws_ref.shape[1:], dws_ref.dtype)
    for fi in range(f_in):
        for jf in range(5):
            fo = 2 * fi + 2 - jf
            if fo < 0 or fo >= f_out:
                continue
            gy = gy_ref[0, pl.ds(fo * c2out, c2out), :]  # [C2out, T]
            for jt in range(2):
                zxs = zx_scr[pl.ds(fi * c2x, c2x), pl.ds(jt, n_time)]
                zss = zs_scr[pl.ds(fi * c2s, c2s), pl.ds(jt, n_time)]
                cx_contrib = jax.lax.dot_general(
                    zxs, gy, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cs_contrib = jax.lax.dot_general(
                    zss, gy, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dwx_ref[0, jf, jt] += cx_contrib
                dws_ref[0, jf, jt] += cs_contrib


# --------------------------------------------------------------------------
# backward host wrappers
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("f_in", "c2in", "c2out",
                                             "interpret"))
def _enc_bwd_gz(gy, w2, *, f_in, c2in, c2out, interpret):
    batch, _, n_time = gy.shape
    f_out = f_in // 2
    we, wo = _enc_bwd_weights(w2, gy.dtype)
    kernel = functools.partial(
        _enc_bwd_gz_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full,
        ],
        out_specs=pl.BlockSpec((1, f_in * c2in, n_time), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, f_in * c2in, n_time), gy.dtype),
        scratch_shapes=[
            pltpu.VMEM(((f_out + 2) * c2out, n_time + 2), gy.dtype)],
        interpret=interpret,
    )(gy, we, wo)


@functools.partial(jax.jit, static_argnames=("f_in", "c2in", "c2out",
                                             "interpret"))
def _enc_bwd_dw(z, gy, *, f_in, c2in, c2out, interpret):
    batch, _, n_time = z.shape
    f_out = f_in // 2
    kernel = functools.partial(
        _enc_bwd_dw_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time)
    dw = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_in * c2in, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 5 * c2in, c2out), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, 5 * c2in, c2out),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 4) * c2in, n_time + 1), z.dtype)],
        interpret=interpret,
    )(z, gy)
    # [B, jt, jf*C2in, C2out] summed over B -> [5, 2, C2in, C2out]
    total = jnp.sum(dw, axis=0).reshape(2, 5, c2in, c2out)
    return jnp.transpose(total, (1, 0, 2, 3))


@functools.partial(jax.jit, static_argnames=("f_in", "c2x", "c2s", "c2out",
                                             "interpret"))
def _dec_bwd_gz(gy, w2, *, f_in, c2x, c2s, c2out, interpret):
    batch, _, n_time = gy.shape
    f_out = 2 * f_in
    wx, ws = _dec_bwd_weights(w2, c2x, c2s, gy.dtype)
    kernel = functools.partial(
        _dec_bwd_gz_kernel, f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full,
        ],
        out_specs=(
            pl.BlockSpec((1, f_in * c2x, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_in * c2s, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f_in * c2x, n_time), gy.dtype),
            jax.ShapeDtypeStruct((batch, f_in * c2s, n_time), gy.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_out + 4) * c2out, n_time + 1), gy.dtype)],
        interpret=interpret,
    )(gy, wx, ws)


@functools.partial(jax.jit, static_argnames=("f_in", "c2x", "c2s", "c2out",
                                             "interpret"))
def _dec_bwd_dw(zx, zs, gy, *, f_in, c2x, c2s, c2out, interpret):
    batch, _, n_time = zx.shape
    kernel = functools.partial(
        _dec_bwd_dw_kernel, f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time)
    dwx, dws = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_in * c2x, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_in * c2s, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * f_in * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 5, 2, c2x, c2out), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, 2, c2s, c2out), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 5, 2, c2x, c2out), jnp.float32),
            jax.ShapeDtypeStruct((batch, 5, 2, c2s, c2out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((f_in * c2x, n_time + 1), zx.dtype),
            pltpu.VMEM((f_in * c2s, n_time + 1), zs.dtype),
        ],
        interpret=interpret,
    )(zx, zs, gy)
    # reassemble the joined-kernel gradient [5, 2, C2x+C2s, C2out] in the
    # complex-cat channel order [xr, sr, xi, si]
    cx, cs = c2x // 2, c2s // 2
    dwx = jnp.sum(dwx, axis=0)
    dws = jnp.sum(dws, axis=0)
    return jnp.concatenate([
        dwx[:, :, :cx], dws[:, :, :cs], dwx[:, :, cx:], dws[:, :, cs:]
    ], axis=2)


# --------------------------------------------------------------------------
# XLA-side backward pieces (lane-efficient in the [B, F, C2, T] layout)
# --------------------------------------------------------------------------

def _swap_parts(arr):
    """partner() over [B, F, C2, T]: swap the stacked r/i channel halves."""
    c = arr.shape[2] // 2
    return jnp.concatenate([arr[:, :, c:], arr[:, :, :c]], axis=2)


def _stats_cotangent(gp, y, f_out, c2out):
    """g_y contribution of the stats-partials cotangent.

    partials rows per item: [sum yr, sum yi, sum yr^2, sum yi^2, sum yr*yi]
    => d/dy_r = gp0 + 2 yr gp2 + yi gp4 ;  d/dy_i = gp1 + 2 yi gp3 + yr gp4.
    """
    batch, _, n_time = y.shape
    yb = y.reshape(batch, f_out, c2out, n_time).astype(jnp.float32)
    c = c2out // 2
    yr, yi = yb[:, :, :c], yb[:, :, c:]
    gp0 = gp[:, 0].astype(jnp.float32)[:, None, :, None]
    gp1 = gp[:, 1].astype(jnp.float32)[:, None, :, None]
    gp2 = gp[:, 2].astype(jnp.float32)[:, None, :, None]
    gp3 = gp[:, 3].astype(jnp.float32)[:, None, :, None]
    gp4 = gp[:, 4].astype(jnp.float32)[:, None, :, None]
    g_yr = gp0 + 2.0 * yr * gp2 + yi * gp4
    g_yi = gp1 + 2.0 * yi * gp3 + yr * gp4
    out = jnp.concatenate([g_yr, g_yi], axis=2)
    return out.reshape(batch, f_out * c2out, n_time)


def _pointwise_bwd(g_z, x, a_diag, a_cross, c0, alpha, f, c2):
    """VJP of z = PReLU(a_diag*x + a_cross*partner(x) + c0) in XLA.

    g_z, x: [B, f*c2, T]. Returns (g_x [B, f*c2, T], d_ad[c2], d_ac[c2],
    d_c0[c2], d_alpha[1]) — coefficient grads reduced over (B, f, T).
    """
    batch, _, n_time = x.shape
    xb = x.reshape(batch, f, c2, n_time).astype(jnp.float32)
    gzb = g_z.reshape(batch, f, c2, n_time).astype(jnp.float32)
    d = a_diag.astype(jnp.float32)[None, None, :, None]
    k = a_cross.astype(jnp.float32)[None, None, :, None]
    b = c0.astype(jnp.float32)[None, None, :, None]
    v = d * xb + k * _swap_parts(xb) + b
    slope = jnp.where(v >= 0, 1.0, alpha.astype(jnp.float32)[0])
    gv = gzb * slope
    g_x = d * gv + _swap_parts(k * gv)
    d_ad = jnp.sum(gv * xb, axis=(0, 1, 3))
    d_ac = jnp.sum(gv * _swap_parts(xb), axis=(0, 1, 3))
    d_c0 = jnp.sum(gv, axis=(0, 1, 3))
    d_alpha = jnp.sum(gzb * jnp.where(v < 0, v, 0.0)).reshape(1)
    z = jnp.where(v >= 0, v, alpha.astype(jnp.float32)[0] * v)
    return (g_x.reshape(batch, f * c2, n_time), z.reshape(batch, f * c2, n_time),
            d_ad, d_ac, d_c0, d_alpha)


# --------------------------------------------------------------------------
# custom-VJP training ops
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def conv_block_train(f_in, c2in, c2out, interpret, x, w2, b2,
                     a_diag, a_cross, c0, alpha):
    """Training-mode fused encoder block: (y, stats_partials) with exact
    gradients. The stats->coeff chain outside this op closes the complex-BN
    backward automatically."""
    return fused_conv_block(
        x, w2, b2, a_diag, a_cross, c0, alpha, f_in=f_in, c2in=c2in,
        c2out=c2out, with_stats=True, interpret=interpret)


def _conv_block_train_fwd(f_in, c2in, c2out, interpret, x, w2, b2,
                          a_diag, a_cross, c0, alpha):
    y, partials = fused_conv_block(
        x, w2, b2, a_diag, a_cross, c0, alpha, f_in=f_in, c2in=c2in,
        c2out=c2out, with_stats=True, interpret=interpret)
    return (y, partials), (x, w2, a_diag, a_cross, c0, alpha, y)


def _conv_block_train_bwd(f_in, c2in, c2out, interpret, res, cts):
    x, w2, a_diag, a_cross, c0, alpha, y = res
    g_y, g_p = cts
    f_out = f_in // 2
    g_y_eff = (g_y.astype(jnp.float32).reshape(y.shape)
               + _stats_cotangent(g_p, y, f_out, c2out)).astype(x.dtype)
    batch, _, n_time = x.shape
    db = jnp.sum(
        g_y_eff.astype(jnp.float32).reshape(batch, f_out, c2out, n_time),
        axis=(0, 1, 3))
    g_z = _enc_bwd_gz(g_y_eff, w2, f_in=f_in, c2in=c2in, c2out=c2out,
                      interpret=interpret)
    g_x, z, d_ad, d_ac, d_c0, d_alpha = _pointwise_bwd(
        g_z, x, a_diag, a_cross, c0, alpha, f_in, c2in)
    dw2 = _enc_bwd_dw(z.astype(x.dtype), g_y_eff, f_in=f_in, c2in=c2in,
                      c2out=c2out, interpret=interpret)
    return (g_x.astype(x.dtype), dw2.astype(w2.dtype), db, d_ad, d_ac, d_c0,
            d_alpha)


conv_block_train.defvjp(_conv_block_train_fwd, _conv_block_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def deconv_block_train(f_in, c2x, c2s, c2out, interpret, x, skip, w2, b2,
                       adx, acx, c0x, alpha_x, ads, acs, c0s, alpha_s):
    """Training-mode fused decoder block (skip join + transposed conv)."""
    return fused_deconv_block(
        x, skip, w2, b2, (adx, acx, c0x), alpha_x, (ads, acs, c0s), alpha_s,
        f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out, with_stats=True,
        interpret=interpret)


def _deconv_block_train_fwd(f_in, c2x, c2s, c2out, interpret, x, skip, w2,
                            b2, adx, acx, c0x, alpha_x, ads, acs, c0s,
                            alpha_s):
    y, partials = fused_deconv_block(
        x, skip, w2, b2, (adx, acx, c0x), alpha_x, (ads, acs, c0s), alpha_s,
        f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out, with_stats=True,
        interpret=interpret)
    return (y, partials), (x, skip, w2, adx, acx, c0x, alpha_x,
                           ads, acs, c0s, alpha_s, y)


def _deconv_block_train_bwd(f_in, c2x, c2s, c2out, interpret, res, cts):
    (x, skip, w2, adx, acx, c0x, alpha_x, ads, acs, c0s, alpha_s, y) = res
    g_y, g_p = cts
    f_out = 2 * f_in
    g_y_eff = (g_y.astype(jnp.float32).reshape(y.shape)
               + _stats_cotangent(g_p, y, f_out, c2out)).astype(x.dtype)
    batch, _, n_time = x.shape
    db = jnp.sum(
        g_y_eff.astype(jnp.float32).reshape(batch, f_out, c2out, n_time),
        axis=(0, 1, 3))
    g_zx, g_zs = _dec_bwd_gz(g_y_eff, w2, f_in=f_in, c2x=c2x, c2s=c2s,
                             c2out=c2out, interpret=interpret)
    g_x, zx, d_adx, d_acx, d_c0x, d_ax = _pointwise_bwd(
        g_zx, x, adx, acx, c0x, alpha_x, f_in, c2x)
    g_s, zs, d_ads, d_acs, d_c0s, d_as = _pointwise_bwd(
        g_zs, skip, ads, acs, c0s, alpha_s, f_in, c2s)
    dw2 = _dec_bwd_dw(zx.astype(x.dtype), zs.astype(x.dtype), g_y_eff,
                      f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out,
                      interpret=interpret)
    return (g_x.astype(x.dtype), g_s.astype(skip.dtype), dw2.astype(w2.dtype),
            db, d_adx, d_acx, d_c0x, d_ax, d_ads, d_acs, d_c0s, d_as)


deconv_block_train.defvjp(_deconv_block_train_fwd, _deconv_block_train_bwd)
