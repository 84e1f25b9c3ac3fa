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
