"""Fused DCCRN complex-conv block kernels (Pallas TPU), blocked-banded.

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

Blocked-banded matmuls: the first on-TPU build issued one small matmul per
output frequency row (f_out x taps issues per kernel, 256-1024 for the
shallow layers) and measured 0.6-2 ms per block — dominated by fixed MXU
issue overhead, not FLOPs. Instead, G output rows are computed per issue
against a statically BANDED weight matrix: for the stride-2 encoder conv,
W_band[(2G+3)*C2in, G*C2out] embeds the 5-tap kernel at row offset 2g for
output g, so

    y[gG..(g+1)G) = sum_{jt} W_band[jt]^T @ z_window[:, jt_shift]

Zero-rows in the band waste (2G+3)/5 x FLOPs — free at ~1% MFU — and cut
issue counts ~16x. G is chosen per layer by minimizing modeled time
(banded FLOPs / MXU rate + fixed per-issue cost) under a VMEM byte budget;
G=1 degenerates to the unbanded kernel. The decoder (stride-2 transposed
conv + complex-cat skip join, models/dccrn.py:399-404) bands its two
parity classes (even rows: 3 taps, odd: 2) into one matrix per joined
region, so the channel concat never exists anywhere — not even in VMEM.

Training-mode CBN batch statistics are emitted as PER-ROW partial sums
[B, R_out, 8] (lanes 0..2 = sum y, sum y^2, sum y*partner over time; the
partner of a row is its complex counterpart +-C inside the frequency
group), reduced to the CBN batch moments by XLA (stats_from_partials) and
folded between kernels (fold_cbn_coeffs). Parameters are identical to the
XLA path (models/dccrn.py _ComplexConvBlock) — this is an execution
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
import numpy as np
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


def stats_from_partials(partials: jnp.ndarray, c2out: int,
                        n_per_channel: int):
    """[B, R_out, 8] per-row kernel partial sums -> CBN batch stats dict.

    Lanes 0..2 of each output row hold sum(y), sum(y^2), sum(y*partner)
    over time; n_per_channel = B * F_out * T. Variances use the one-pass
    E[x^2]-E[x]^2 form exactly like ComplexBatchNorm._folded. The cross
    moment is read from the r-half rows (the i-half rows carry the same
    products).
    """
    total = jnp.sum(partials.astype(jnp.float32), axis=0)  # [R, 8]
    f_out = total.shape[0] // c2out
    per = total.reshape(f_out, c2out, 8).sum(axis=0)  # [c2out, 8]
    c = c2out // 2
    inv_n = 1.0 / float(n_per_channel)
    mean_r = per[:c, 0] * inv_n
    mean_i = per[c:, 0] * inv_n
    vrr = jnp.maximum(per[:c, 1] * inv_n - mean_r * mean_r, 0.0)
    vii = jnp.maximum(per[c:, 1] * inv_n - mean_i * mean_i, 0.0)
    vri = per[:c, 2] * inv_n - mean_r * mean_i
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
    out_dtype = x.dtype
    # Mosaic rotates/extracts are 32-bit only: do the pointwise in f32
    # (in-VMEM cost only; also matches the XLA reference's f32 coeff math)
    x = x.astype(jnp.float32)
    coef = coef.astype(jnp.float32)
    alpha = jnp.asarray(alpha).astype(jnp.float32)
    rows = x.shape[0]
    partner = jnp.where(
        mask > 0.5,
        pltpu.roll(x, rows - c, axis=0),  # == roll by -c
        pltpu.roll(x, c, axis=0),
    )
    z = coef[0] * x + coef[1] * partner + coef[2]
    return jnp.where(z >= 0, z, alpha * z).astype(out_dtype)


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


def _write_stats(stats_ref, acc, smask, row0: int, c2out: int):
    """Per-row stat partials of one output block: lanes (sum y, sum y^2,
    sum y*partner, 0...). acc: [G*c2out, T] f32; smask selects the roll
    direction per row half exactly like _pointwise."""
    rows = acc.shape[0]
    c = c2out // 2
    partner = jnp.where(
        smask > 0.5,
        pltpu.roll(acc, rows - c, axis=0),
        pltpu.roll(acc, c, axis=0),
    )
    s0 = jnp.sum(acc, axis=-1, keepdims=True)
    s1 = jnp.sum(acc * acc, axis=-1, keepdims=True)
    s2 = jnp.sum(acc * partner, axis=-1, keepdims=True)
    pad = jnp.zeros((rows, 5), acc.dtype)
    stats_ref[0, pl.ds(row0, rows), :] = jnp.concatenate(
        [s0, s1, s2, pad], axis=1)


# --------------------------------------------------------------------------
# banded weight builders + group-size selection
# --------------------------------------------------------------------------

# VMEM byte budget per banded matrix (f32 accounting — the dw accumulators
# are the largest instance); beyond it smaller G is forced.
_BAND_BUDGET = 8 << 20
# Fixed per-matmul-issue cost observed on v5e through this kernel style
# (~2 us: issue + scratch-slice setup); the G picker trades banded zero
# FLOPs against it.
_ISSUE_COST_S = 2e-6
_MXU_RATE = 1e14  # effective bf16 FLOP/s assumed for the model (~50% peak)


def _pick_g_stride(f_out: int, c2in: int, c2out: int, n_time: int,
                   taps: int = 2) -> int:
    """Group size for stride-2 'encoder-style' bands (window 2G+3)."""
    best_g, best_t = 1, None
    for g in (32, 16, 8, 4, 2, 1):
        if f_out % g:
            continue
        rows, cols = (2 * g + 3) * c2in, g * c2out
        if rows * cols * 4 > _BAND_BUDGET:
            continue
        est = (f_out // g) * taps * (
            rows * cols * n_time * 2 / _MXU_RATE + _ISSUE_COST_S)
        if best_t is None or est < best_t:
            best_g, best_t = g, est
    return best_g


def _pick_g_parity(f_out: int, c2_regions, c2out: int, n_time: int) -> int:
    """Group size for parity-banded 'decoder-style' bands (window G/2+2).

    c2_regions: per-region input row counts (one entry per 2-tap matmul
    pair). G must be even — the band interleaves both parity classes.
    """
    best_g, best_t = 2, None
    for g in (32, 16, 8, 4, 2):
        if f_out % g:
            continue
        cols = g * c2out
        if max(c2_regions) * (g // 2 + 2) * cols * 4 > _BAND_BUDGET:
            continue
        est = 0.0
        for c2r in c2_regions:
            rows = (g // 2 + 2) * c2r
            est += (f_out // g) * 2 * (
                rows * cols * n_time * 2 / _MXU_RATE + _ISSUE_COST_S)
        if best_t is None or est < best_t:
            best_g, best_t = g, est
    return best_g


def _stride_band(w5: jnp.ndarray, G: int, dtype):
    """[2, 5*c2r, C] tap stack (5 consecutive input groups, ascending) ->
    banded [2, (2G+3)*c2r, G*C]: output group g's window sits at input-group
    offset 2g."""
    kw, rows5, cols = w5.shape
    c2r = rows5 // 5
    w5r = w5.astype(jnp.float32).reshape(kw, 5, c2r, cols)
    w = jnp.zeros((kw, 2 * G + 3, c2r, G, cols), jnp.float32)
    for g in range(G):
        w = w.at[:, 2 * g:2 * g + 5, :, g, :].set(w5r)
    return w.reshape(kw, (2 * G + 3) * c2r, G * cols).astype(dtype)


def _parity_band(we: jnp.ndarray, wo: jnp.ndarray, G: int, dtype):
    """Even/odd tap stacks ([2, 3*c2r, C] / [2, 2*c2r, C]) -> banded
    [2, (G/2+2)*c2r, G*C]: even output g at input-group offset g/2 (span 3),
    odd g at (g+1)/2 (span 2). G must be even."""
    assert G % 2 == 0, G
    kw, rows3, cols = we.shape
    c2r = rows3 // 3
    we_r = we.astype(jnp.float32).reshape(kw, 3, c2r, cols)
    wo_r = wo.astype(jnp.float32).reshape(kw, 2, c2r, cols)
    w = jnp.zeros((kw, G // 2 + 2, c2r, G, cols), jnp.float32)
    for g in range(G):
        if g % 2 == 0:
            w = w.at[:, g // 2:g // 2 + 3, :, g, :].set(we_r)
        else:
            w = w.at[:, (g + 1) // 2:(g + 1) // 2 + 2, :, g, :].set(wo_r)
    return w.reshape(kw, (G // 2 + 2) * c2r, G * cols).astype(dtype)


def _sel_stride(G: int) -> jnp.ndarray:
    """One-hot [5, 2G+3, G] mapping banded dW rows back to the 5 freq taps
    (inverse of _stride_band's placement)."""
    s = np.zeros((5, 2 * G + 3, G), np.float32)
    for g in range(G):
        for jf in range(5):
            s[jf, 2 * g + jf, g] = 1.0
    return jnp.asarray(s)


def _sel_parity(G: int, even_taps, odd_taps) -> jnp.ndarray:
    """One-hot [5, G/2+2, G] inverting _parity_band's placement; even_taps/
    odd_taps give the jf owning each stacked row (e.g. (0,2,4) / (1,3))."""
    s = np.zeros((5, G // 2 + 2, G), np.float32)
    for g in range(G):
        if g % 2 == 0:
            for k, jf in enumerate(even_taps):
                s[jf, g // 2 + k, g] = 1.0
        else:
            for k, jf in enumerate(odd_taps):
                s[jf, (g + 1) // 2 + k, g] = 1.0
    return jnp.asarray(s)


# Blocks + scratches of the big encoder layers exceed the 16 MB default
# scoped-vmem budget by a hair; v5e has headroom above it.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _matmul(w, rhs):
    return jax.lax.dot_general(
        w, rhs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# encoder kernel: strided conv, k=(5,2) s=(2,1), causal time pad
# --------------------------------------------------------------------------

def _enc_kernel(x_ref, w_ref, b_ref, coef_ref, mask_ref, alpha_ref,
                smask_ref, y_ref, stats_ref, z_scr, *,
                f_in, f_out, c2in, c2out, n_time, G, with_stats):
    c = c2in // 2
    x = x_ref[0]
    z = _pointwise(x, coef_ref[...], mask_ref[...], alpha_ref[0, 0], c)
    # scratch layout: [ (F+4)*C2in rows , T+1 lanes ]; 2 zero freq groups on
    # each side; lane 0 is the causal zero column (x[t-1] at t=0).
    pad_rows = 2 * c2in
    z_scr[...] = jnp.zeros(z_scr.shape, z_scr.dtype)
    z_scr[pl.ds(pad_rows, f_in * c2in), pl.ds(1, n_time)] = z
    bias = b_ref[...]  # [G*C2out, 1]
    span = (2 * G + 3) * c2in
    for blk in range(f_out // G):
        r0 = 2 * blk * G * c2in
        # y window = sum_jt W_band_jt^T z_window[:, jt-shift] (causal corr.)
        acc = _matmul(w_ref[0], z_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        acc += _matmul(w_ref[1], z_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc = acc + bias
        y_ref[0, pl.ds(blk * G * c2out, G * c2out), :] = acc.astype(y_ref.dtype)
        if with_stats:
            _write_stats(stats_ref, acc, smask_ref[...], blk * G * c2out,
                         c2out)


# --------------------------------------------------------------------------
# decoder kernel: transposed conv (stride 2, crop [2:-1] freq / [1:] time)
# with the complex-cat skip join assembled implicitly via split weights
# --------------------------------------------------------------------------

def _dec_kernel(x_ref, s_ref, wx_ref, ws_ref, b_ref,
                coef_x_ref, mask_x_ref, alpha_x_ref,
                coef_s_ref, mask_s_ref, alpha_s_ref, smask_ref,
                y_ref, stats_ref, zx_scr, zs_scr, *,
                f_in, f_out, c2x, c2s, c2out, n_time, G, with_stats):
    """y[fo, to] = sum_{jf: fo+jf even} sum_jt k[jf, jt] z[(fo+jf-2)/2, to+jt]

    (lax.conv_transpose VALID, stride (2,1), then y[2:-1] freq crop and
    [1:] time chomp — models/dccrn.py:218-229). Channel order of the joined
    input is [xr, skip_r, xi, skip_i]; instead of concatenating, each
    banded matmul is split into an x-part and a skip-part with weight rows
    reordered to match (the contraction is permutation-invariant). Both
    parity classes (even fo: taps jf 0,2,4; odd: 1,3) live in one parity
    band per region.
    """
    cx = c2x // 2
    cs = c2s // 2
    zx = _pointwise(x_ref[0], coef_x_ref[...], mask_x_ref[...],
                    alpha_x_ref[0, 0], cx)
    zs = _pointwise(s_ref[0], coef_s_ref[...], mask_s_ref[...],
                    alpha_s_ref[0, 0], cs)
    # scratch: 1 zero freq group each side; lane 0 zero; the jt=1 tap's
    # final column (z[T..]) is a trailing zero lane: [.., T+2] with both
    # lane 0 and lane T+1 zero.
    zx_scr[...] = jnp.zeros(zx_scr.shape, zx_scr.dtype)
    zs_scr[...] = jnp.zeros(zs_scr.shape, zs_scr.dtype)
    zx_scr[pl.ds(c2x, f_in * c2x), pl.ds(1, n_time)] = zx
    zs_scr[pl.ds(c2s, f_in * c2s), pl.ds(1, n_time)] = zs
    bias = b_ref[...]
    span_x = (G // 2 + 2) * c2x
    span_s = (G // 2 + 2) * c2s
    for blk in range(f_out // G):
        fi0 = blk * G // 2
        rx, rs = fi0 * c2x, fi0 * c2s
        # jt = 0 -> z[.., to] (scratch lane to+1);  jt = 1 -> z[.., to+1]
        acc = _matmul(wx_ref[0], zx_scr[pl.ds(rx, span_x), pl.ds(1, n_time)])
        acc += _matmul(wx_ref[1], zx_scr[pl.ds(rx, span_x), pl.ds(2, n_time)])
        acc += _matmul(ws_ref[0], zs_scr[pl.ds(rs, span_s), pl.ds(1, n_time)])
        acc += _matmul(ws_ref[1], zs_scr[pl.ds(rs, span_s), pl.ds(2, n_time)])
        acc = acc + bias
        y_ref[0, pl.ds(blk * G * c2out, G * c2out), :] = acc.astype(y_ref.dtype)
        if with_stats:
            _write_stats(stats_ref, acc, smask_ref[...], blk * G * c2out,
                         c2out)


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
    Returns y [B, (f_in//2)*c2out, T] (+ per-row stat partials
    [B, (f_in//2)*c2out, 8]).
    """
    batch, rows, n_time = x.shape
    assert rows == f_in * c2in, (rows, f_in, c2in)
    f_out = f_in // 2
    G = _pick_g_stride(f_out, c2in, c2out, n_time)
    w = _stride_band(_enc_weights(w2, jnp.float32), G, x.dtype)
    bias = jnp.tile(jnp.asarray(b2, jnp.float32), G)[:, None]
    coef = _tile_coeffs(a_diag, a_cross, c0, f_in, c2in, x.dtype)
    mask = _half_mask(f_in, c2in)
    smask = _half_mask(G, c2out)
    alpha = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _enc_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time, G=G, with_stats=with_stats,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    y, stats = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, rows, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full,
        ],
        out_specs=(
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out * c2out, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f_out * c2out, n_time), x.dtype),
            jax.ShapeDtypeStruct((batch, f_out * c2out, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 4) * c2in, n_time + 1), x.dtype)
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x, w, bias, coef, mask, alpha, smask)
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
    y [B, (2*f_in)*c2out, T] (+ per-row stat partials [B, 2*f_in*c2out, 8]).
    """
    batch, rows_x, n_time = x.shape
    assert rows_x == f_in * c2x
    f_out = 2 * f_in
    G = _pick_g_parity(f_out, (c2x, c2s), c2out, n_time)
    we_x, we_s, wo_x, wo_s = _dec_weights(w2, c2x, c2s, jnp.float32)
    wx = _parity_band(we_x, wo_x, G, x.dtype)
    ws = _parity_band(we_s, wo_s, G, x.dtype)
    bias = jnp.tile(jnp.asarray(b2, jnp.float32), G)[:, None]
    cfx = _tile_coeffs(*coef_x, f_in, c2x, x.dtype)
    cfs = _tile_coeffs(*coef_s, f_in, c2s, x.dtype)
    mx = _half_mask(f_in, c2x)
    ms = _half_mask(f_in, c2s)
    smask = _half_mask(G, c2out)
    ax = jnp.asarray(alpha_x, jnp.float32).reshape(1, 1)
    a_s = jnp.asarray(alpha_s, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _dec_kernel, f_in=f_in, f_out=f_out, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time, G=G, with_stats=with_stats,
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
            full, full, full, full, full, full, full, full, full, full,
        ],
        out_specs=(
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out * c2out, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f_out * c2out, n_time), x.dtype),
            jax.ShapeDtypeStruct((batch, f_out * c2out, 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 2) * c2x, n_time + 2), x.dtype),
            pltpu.VMEM(((f_in + 2) * c2s, n_time + 2), x.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x, skip, wx, ws, bias, cfx, mx, ax, cfs, ms, a_s, smask)
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


def _enc_bwd_gz_kernel(gy_ref, w_ref, gz_ref, gy_scr, *,
                       f_in, f_out, c2in, c2out, n_time, G):
    """g_z = conv^T(g_y) for the stride-(2,1) causal encoder conv.

    Time: y[to] consumed z[to + jt - 1]  =>  g_z[ti] += W_jt^T g_y[ti-jt+1];
    scratch holds g_y at lane cols [1..T] with cols 0 and T+1 zero, so the
    jt tap reads cols [2-jt, 2-jt+T). Structure is a stride-2 transposed
    conv over frequency -> one parity band covers G input rows per issue.
    """
    gy_scr[...] = jnp.zeros(gy_scr.shape, gy_scr.dtype)
    gy_scr[pl.ds(c2out, f_out * c2out), pl.ds(1, n_time)] = gy_ref[0]
    span = (G // 2 + 2) * c2out
    for blk in range(f_in // G):
        r0 = (blk * G // 2) * c2out
        acc = _matmul(w_ref[0], gy_scr[pl.ds(r0, span), pl.ds(2, n_time)])
        acc += _matmul(w_ref[1], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        gz_ref[0, pl.ds(blk * G * c2in, G * c2in), :] = acc.astype(gz_ref.dtype)


def _enc_bwd_dw_kernel(z_ref, gy_ref, dw_ref, z_scr, *,
                       f_in, f_out, c2in, c2out, n_time, G):
    """dW_band[jt] += z_window[:, jt-shift] @ g_y_block^T, accumulated over
    output blocks (the band structure is block-invariant); the caller
    extracts the 5 taps from the band (sel_stride) and sums over batch.
    """
    z_scr[...] = jnp.zeros(z_scr.shape, z_scr.dtype)
    z_scr[pl.ds(2 * c2in, f_in * c2in), pl.ds(1, n_time)] = z_ref[0]
    span = (2 * G + 3) * c2in
    dw_ref[0] = jnp.zeros(dw_ref.shape[1:], dw_ref.dtype)
    for blk in range(f_out // G):
        r0 = 2 * blk * G * c2in
        gy = gy_ref[0, pl.ds(blk * G * c2out, G * c2out), :]  # [G*C2out, T]
        for jt in range(2):
            zs = z_scr[pl.ds(r0, span), pl.ds(jt, n_time)]
            contrib = jax.lax.dot_general(
                zs, gy, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [span, G*C2out]
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
                       f_in, c2x, c2s, c2out, n_time, G):
    """Input gradients of the decoder block for both joined regions.

    Time: y[to] consumed z[to + jt]  =>  g_z[ti] += k_jt^T g_y[ti - jt];
    scratch cols [1..T] hold g_y, col 0 zero, so the jt tap reads cols
    [1-jt, 1-jt+T). Frequency structure is encoder-like (each input row
    sees 5 consecutive g_y groups at stride 2) -> one stride band covers
    G input rows per issue.
    """
    f_out = 2 * f_in
    gy_scr[...] = jnp.zeros(gy_scr.shape, gy_scr.dtype)
    gy_scr[pl.ds(2 * c2out, f_out * c2out), pl.ds(1, n_time)] = gy_ref[0]
    span = (2 * G + 3) * c2out
    for blk in range(f_in // G):
        r0 = 2 * blk * G * c2out
        acc_x = _matmul(wx_ref[0], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc_x += _matmul(wx_ref[1], gy_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        acc_s = _matmul(ws_ref[0], gy_scr[pl.ds(r0, span), pl.ds(1, n_time)])
        acc_s += _matmul(ws_ref[1], gy_scr[pl.ds(r0, span), pl.ds(0, n_time)])
        gzx_ref[0, pl.ds(blk * G * c2x, G * c2x), :] = acc_x.astype(gzx_ref.dtype)
        gzs_ref[0, pl.ds(blk * G * c2s, G * c2s), :] = acc_s.astype(gzs_ref.dtype)


def _dec_bwd_dw_kernel(zx_ref, zs_ref, gy_ref, dwx_ref, dws_ref,
                       zx_scr, zs_scr, *,
                       f_in, c2x, c2s, c2out, n_time, G):
    """Banded weight gradients of the decoder block, per joined region.

    dW_band[jt] += z_window[:, jt-shift] @ g_y_block^T with the forward's
    parity-band window; the caller extracts the 5 taps (sel_parity) and
    sums over batch. Scratch = the forward layout (z at cols 1..T, zero
    cols 0 and T+1).
    """
    f_out = 2 * f_in
    zx_scr[...] = jnp.zeros(zx_scr.shape, zx_scr.dtype)
    zs_scr[...] = jnp.zeros(zs_scr.shape, zs_scr.dtype)
    zx_scr[pl.ds(c2x, f_in * c2x), pl.ds(1, n_time)] = zx_ref[0]
    zs_scr[pl.ds(c2s, f_in * c2s), pl.ds(1, n_time)] = zs_ref[0]
    span_x = (G // 2 + 2) * c2x
    span_s = (G // 2 + 2) * c2s
    dwx_ref[0] = jnp.zeros(dwx_ref.shape[1:], dwx_ref.dtype)
    dws_ref[0] = jnp.zeros(dws_ref.shape[1:], dws_ref.dtype)
    for blk in range(f_out // G):
        fi0 = blk * G // 2
        rx, rs = fi0 * c2x, fi0 * c2s
        gy = gy_ref[0, pl.ds(blk * G * c2out, G * c2out), :]  # [G*C2out, T]
        for jt, col in ((0, 1), (1, 2)):
            zxs = zx_scr[pl.ds(rx, span_x), pl.ds(col, n_time)]
            zss = zs_scr[pl.ds(rs, span_s), pl.ds(col, n_time)]
            dwx_ref[0, jt] += jax.lax.dot_general(
                zxs, gy, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dws_ref[0, jt] += jax.lax.dot_general(
                zss, gy, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# backward host wrappers
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("f_in", "c2in", "c2out",
                                             "interpret"))
def _enc_bwd_gz(gy, w2, *, f_in, c2in, c2out, interpret):
    batch, _, n_time = gy.shape
    f_out = f_in // 2
    G = _pick_g_parity(f_in, (c2out,), c2in, n_time)
    we, wo = _enc_bwd_weights(w2, jnp.float32)
    w = _parity_band(we, wo, G, gy.dtype)
    kernel = functools.partial(
        _enc_bwd_gz_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time, G=G)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full,
        ],
        out_specs=pl.BlockSpec((1, f_in * c2in, n_time), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, f_in * c2in, n_time), gy.dtype),
        scratch_shapes=[
            pltpu.VMEM(((f_out + 2) * c2out, n_time + 2), gy.dtype)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(gy, w)


@functools.partial(jax.jit, static_argnames=("f_in", "c2in", "c2out",
                                             "interpret"))
def _enc_bwd_dw(z, gy, *, f_in, c2in, c2out, interpret):
    batch, _, n_time = z.shape
    f_out = f_in // 2
    G = _pick_g_stride(f_out, c2in, c2out, n_time)
    kernel = functools.partial(
        _enc_bwd_dw_kernel, f_in=f_in, f_out=f_out, c2in=c2in, c2out=c2out,
        n_time=n_time, G=G)
    span = (2 * G + 3) * c2in
    dw = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, f_in * c2in, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out * c2out, n_time), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, span, G * c2out),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, span, G * c2out),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 4) * c2in, n_time + 1), z.dtype)],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(z, gy)
    # [B, jt, (2G+3)*C2in, G*C2out] summed over B, then tap extraction:
    # dW[jf, jt, ci, co] = sum_g band[jt, 2g+jf, ci, g, co]
    band = jnp.sum(dw, axis=0).reshape(2, 2 * G + 3, c2in, G, c2out)
    return jnp.einsum("twigo,jwg->jtio", band, _sel_stride(G))


@functools.partial(jax.jit, static_argnames=("f_in", "c2x", "c2s", "c2out",
                                             "interpret"))
def _dec_bwd_gz(gy, w2, *, f_in, c2x, c2s, c2out, interpret):
    batch, _, n_time = gy.shape
    f_out = 2 * f_in
    G = _pick_g_stride(f_in, c2out, max(c2x, c2s), n_time, taps=4)
    wx5, ws5 = _dec_bwd_weights(w2, c2x, c2s, jnp.float32)
    wx = _stride_band(wx5, G, gy.dtype)
    ws = _stride_band(ws5, G, gy.dtype)
    kernel = functools.partial(
        _dec_bwd_gz_kernel, f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time, G=G)
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
        compiler_params=_VMEM_LIMIT,
    )(gy, wx, ws)


@functools.partial(jax.jit, static_argnames=("f_in", "c2x", "c2s", "c2out",
                                             "interpret"))
def _dec_bwd_dw(zx, zs, gy, *, f_in, c2x, c2s, c2out, interpret):
    batch, _, n_time = zx.shape
    f_out = 2 * f_in
    G = _pick_g_parity(f_out, (c2x, c2s), c2out, n_time)
    kernel = functools.partial(
        _dec_bwd_dw_kernel, f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out,
        n_time=n_time, G=G)
    span_x = (G // 2 + 2) * c2x
    span_s = (G // 2 + 2) * c2s
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
            pl.BlockSpec((1, 2, span_x, G * c2out), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, span_s, G * c2out), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 2, span_x, G * c2out), jnp.float32),
            jax.ShapeDtypeStruct((batch, 2, span_s, G * c2out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((f_in + 2) * c2x, n_time + 2), zx.dtype),
            pltpu.VMEM(((f_in + 2) * c2s, n_time + 2), zs.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(zx, zs, gy)
    # band -> taps (inverse of _parity_band: even rows hold jf 0,2,4; odd
    # rows jf 1,3), then reassemble the joined-kernel gradient
    # [5, 2, C2x+C2s, C2out] in the complex-cat channel order [xr, sr, xi, si]
    sel = _sel_parity(G, (0, 2, 4), (1, 3))
    bx = jnp.sum(dwx, axis=0).reshape(2, G // 2 + 2, c2x, G, c2out)
    bs = jnp.sum(dws, axis=0).reshape(2, G // 2 + 2, c2s, G, c2out)
    dwx = jnp.einsum("twigo,jwg->jtio", bx, sel)
    dws = jnp.einsum("twigo,jwg->jtio", bs, sel)
    cx, cs = c2x // 2, c2s // 2
    return jnp.concatenate([
        dwx[:, :, :cx], dws[:, :, :cs], dwx[:, :, cx:], dws[:, :, cs:]
    ], axis=2)


# --------------------------------------------------------------------------
# XLA-side backward pieces (lane-efficient in the [B, F, C2, T] layout)
# --------------------------------------------------------------------------

def _swap_parts(arr):
    """partner() over [B, F, C2, ...]: swap the stacked r/i channel halves."""
    c = arr.shape[2] // 2
    return jnp.concatenate([arr[:, :, c:], arr[:, :, :c]], axis=2)


def _stats_cotangent(gp, y, f_out, c2out):
    """g_y contribution of the per-row stats-partials cotangent.

    partials lanes per row: [sum y, sum y^2, sum y*partner]
    => d/dy[row] = gp0[row] + 2 y[row] gp1[row]
                   + (gp2[row] + gp2[partner]) * y[partner].
    """
    batch, _, n_time = y.shape
    yb = y.reshape(batch, f_out, c2out, n_time).astype(jnp.float32)
    gb = gp.astype(jnp.float32).reshape(batch, f_out, c2out, 8)
    g0 = gb[..., 0][..., None]
    g1 = gb[..., 1][..., None]
    g2 = gb[..., 2][..., None]
    out = g0 + 2.0 * yb * g1 + (g2 + _swap_parts(g2)) * _swap_parts(yb)
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
