"""Parity: fused Pallas conv-block kernels vs the XLA compositions they fuse.

Ground truth is built from the exact ops the DCCRN XLA path uses
(models/dccrn.py _ComplexConvBlock/_ComplexDeconvBlock): block-matrix
complex conv via lax.conv_general_dilated / lax.conv_transpose, folded CBN
apply, scalar PReLU. Interpret mode keeps the tests hermetic on CPU; the
compiled kernels are exercised on real TPU by tools/bench_conv_block.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models.dccrn import _block_complex_kernel
from speech_enhancement_tpu.ops.pallas.experimental import conv_block as cb


def _rand_coeffs(key, c2):
    k1, k2, k3 = jax.random.split(key, 3)
    return (1.0 + 0.1 * jax.random.normal(k1, (c2,)),
            0.1 * jax.random.normal(k2, (c2,)),
            0.1 * jax.random.normal(k3, (c2,)))


def _flatten(x_bfct):
    """[B, F, C2, T] -> [B, F*C2, T]."""
    b, f, c2, t = x_bfct.shape
    return x_bfct.reshape(b, f * c2, t)


def _to_nhwc(x_bfct):
    return jnp.transpose(x_bfct, (0, 1, 3, 2))  # [B, F, T, C2]


@pytest.mark.parametrize("c2in,c2out", [(2, 16), (16, 32), (8, 8)])
def test_enc_block_matches_xla(c2in, c2out):
    key = jax.random.PRNGKey(0)
    batch, f_in, n_time = 2, 16, 40
    kx, kw, kc = jax.random.split(key, 3)
    x = jax.random.normal(kx, (batch, f_in, c2in, n_time))
    wr = jax.random.normal(kw, (5, 2, c2in // 2, c2out // 2)) * 0.2
    wi = jax.random.normal(jax.random.fold_in(kw, 1),
                           (5, 2, c2in // 2, c2out // 2)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(kw, 2), (c2out,)) * 0.1
    a_diag, a_cross, c0 = _rand_coeffs(kc, c2in)
    alpha = 0.25

    # ground truth: pointwise -> NHWC conv (exact _ComplexConvBlock conv)
    z = cb._pointwise_ref(x, a_diag, a_cross, c0, alpha)
    kernel = _block_complex_kernel(wr, wi)
    y_ref = jax.lax.conv_general_dilated(
        _to_nhwc(z), kernel, (2, 1), ((2, 2), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2
    y_ref = jnp.transpose(y_ref, (0, 1, 3, 2))  # [B, F_out, C2out, T]

    w2 = _block_complex_kernel(wr, wi)
    y, stats = cb.fused_conv_block(
        _flatten(x), w2, b2, a_diag, a_cross, c0, alpha,
        f_in=f_in, c2in=c2in, c2out=c2out, with_stats=True, interpret=True,
    )
    f_out = f_in // 2
    y = y.reshape(batch, f_out, c2out, n_time)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    # stats partials reduce to the CBN batch moments of the conv output
    assert stats.shape == (batch, f_out * c2out, 8)
    got = cb.stats_from_partials(stats, c2out, batch * f_out * n_time)
    c = c2out // 2
    yr = np.asarray(y_ref[:, :, :c]).astype(np.float64)
    yi = np.asarray(y_ref[:, :, c:]).astype(np.float64)
    np.testing.assert_allclose(got["mean_r"], yr.mean(axis=(0, 1, 3)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["vrr"], yr.var(axis=(0, 1, 3)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        got["vri"],
        (yr * yi).mean(axis=(0, 1, 3))
        - yr.mean(axis=(0, 1, 3)) * yi.mean(axis=(0, 1, 3)),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("c2x,c2s,c2out", [(16, 16, 8), (8, 8, 2), (4, 4, 16)])
def test_dec_block_matches_xla(c2x, c2s, c2out):
    key = jax.random.PRNGKey(1)
    batch, f_in, n_time = 2, 8, 33
    kx, ks, kw, kc = jax.random.split(key, 4)
    x = jax.random.normal(kx, (batch, f_in, c2x, n_time))
    skip = jax.random.normal(ks, (batch, f_in, c2s, n_time))
    c2j = c2x + c2s
    wr = jax.random.normal(kw, (5, 2, c2j // 2, c2out // 2)) * 0.2
    wi = jax.random.normal(jax.random.fold_in(kw, 1),
                           (5, 2, c2j // 2, c2out // 2)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(kw, 2), (c2out,)) * 0.1
    coef_x = _rand_coeffs(kc, c2x)
    coef_s = _rand_coeffs(jax.random.fold_in(kc, 1), c2s)
    ax, a_s = 0.25, 0.1

    # ground truth: pointwise each, complex-cat join, NHWC conv_transpose
    zx = cb._pointwise_ref(x, *coef_x, ax)
    zs = cb._pointwise_ref(skip, *coef_s, a_s)
    cxh, csh = c2x // 2, c2s // 2
    joined = jnp.concatenate(
        [zx[:, :, :cxh], zs[:, :, :csh], zx[:, :, cxh:], zs[:, :, csh:]],
        axis=2)
    kernel = _block_complex_kernel(wr, wi)
    y_ref = jax.lax.conv_transpose(
        _to_nhwc(joined), kernel, (2, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, 2:-1, 1:, :] + b2
    y_ref = jnp.transpose(y_ref, (0, 1, 3, 2))

    y, _ = cb.fused_deconv_block(
        _flatten(x), _flatten(skip), kernel, b2, coef_x, ax, coef_s, a_s,
        f_in=f_in, c2x=c2x, c2s=c2s, c2out=c2out, with_stats=True,
        interpret=True,
    )
    y = y.reshape(batch, 2 * f_in, c2out, n_time)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_identity_coeffs_passthrough():
    x = jnp.linspace(-1, 1, 2 * 4 * 4 * 6).reshape(2, 4, 4, 6)
    a_diag, a_cross, c0 = cb.identity_coeffs(4)
    z = cb._pointwise_ref(x, a_diag, a_cross, c0, 1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))
