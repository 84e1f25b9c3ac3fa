"""Op-level VJP parity: custom-VJP fused blocks vs autodiff of the exact
XLA composition, with random cotangents on BOTH outputs (y and the CBN stat
partials). This pins every gradient component — input, weights, bias,
folded coeffs, PReLU alpha — without the full-model cancellation chains.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ops.pallas.experimental import conv_block as cb


def _coeffs(key, k, c2):
    return (1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, k), (c2,)),
            0.1 * jax.random.normal(jax.random.fold_in(key, k + 1), (c2,)),
            0.1 * jax.random.normal(jax.random.fold_in(key, k + 2), (c2,)))


def _partials_ref(yb):
    """Per-row stat partials [B, F*C2, 8] (lanes: sum y, sum y^2,
    sum y*partner) matching the kernels' blocked-banded stats contract."""
    b, f, c2, _ = yb.shape
    c = c2 // 2
    partner = jnp.concatenate([yb[:, :, c:], yb[:, :, :c]], axis=2)
    s0 = yb.sum(-1)
    s1 = (yb * yb).sum(-1)
    s2 = (yb * partner).sum(-1)
    zero = jnp.zeros_like(s0)
    p = jnp.stack([s0, s1, s2, zero, zero, zero, zero, zero], axis=-1)
    return p.reshape(b, f * c2, 8)


def test_conv_block_train_vjp_matches_autodiff():
    key = jax.random.PRNGKey(0)
    batch, f_in, c2in, c2out, n_time = 2, 16, 8, 16, 40
    x = jax.random.normal(key, (batch, f_in * c2in, n_time)) * 0.5
    w2 = jax.random.normal(jax.random.fold_in(key, 1), (5, 2, c2in, c2out)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(key, 2), (c2out,)) * 0.1
    ad, ac, c0 = _coeffs(key, 3, c2in)
    alpha = jnp.array([0.25])

    def ref_fn(x, w2, b2, ad, ac, c0, alpha):
        xb = x.reshape(batch, f_in, c2in, n_time)
        z = cb._pointwise_ref(xb, ad, ac, c0, alpha)
        y = jax.lax.conv_general_dilated(
            jnp.transpose(z, (0, 1, 3, 2)), w2, (2, 1), ((2, 2), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        yb = jnp.transpose(y, (0, 1, 3, 2))
        return yb.reshape(batch, (f_in // 2) * c2out, n_time), _partials_ref(yb)

    def fused_fn(x, w2, b2, ad, ac, c0, alpha):
        return cb.conv_block_train(f_in, c2in, c2out, True,
                                   x, w2, b2, ad, ac, c0, alpha)

    args = (x, w2, b2, ad, ac, c0, alpha)
    ky, kp = jax.random.split(jax.random.fold_in(key, 9))
    gy = jax.random.normal(ky, (batch, (f_in // 2) * c2out, n_time))
    gp = jax.random.normal(kp, (batch, (f_in // 2) * c2out, 8))

    y_ref, p_ref = ref_fn(*args)
    y_fused, p_fused = fused_fn(*args)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_fused[..., :3]),
                               np.asarray(p_ref[..., :3]), rtol=1e-4,
                               atol=1e-3)

    _, vjp_ref = jax.vjp(ref_fn, *args)
    _, vjp_fused = jax.vjp(fused_fn, *args)
    for name, a, b in zip(("x", "w2", "b2", "ad", "ac", "c0", "alpha"),
                          vjp_ref((gy, gp)), vjp_fused((gy, gp))):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=f"grad mismatch: {name}")


def test_deconv_block_train_vjp_matches_autodiff():
    key = jax.random.PRNGKey(7)
    batch, f_in, c2x, c2s, c2out, n_time = 2, 8, 8, 8, 8, 33
    x = jax.random.normal(key, (batch, f_in * c2x, n_time)) * 0.5
    s = jax.random.normal(jax.random.fold_in(key, 1),
                          (batch, f_in * c2s, n_time)) * 0.5
    w2 = jax.random.normal(jax.random.fold_in(key, 2),
                           (5, 2, c2x + c2s, c2out)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(key, 3), (c2out,)) * 0.1
    adx, acx, c0x = _coeffs(key, 4, c2x)
    ads, acs, c0s = _coeffs(key, 8, c2s)
    ax, a_s = jnp.array([0.25]), jnp.array([0.1])

    def ref_fn(x, s, w2, b2, adx, acx, c0x, ax, ads, acs, c0s, a_s):
        xb = x.reshape(batch, f_in, c2x, n_time)
        sb = s.reshape(batch, f_in, c2s, n_time)
        zx = cb._pointwise_ref(xb, adx, acx, c0x, ax)
        zs = cb._pointwise_ref(sb, ads, acs, c0s, a_s)
        cxh, csh = c2x // 2, c2s // 2
        joined = jnp.concatenate([zx[:, :, :cxh], zs[:, :, :csh],
                                  zx[:, :, cxh:], zs[:, :, csh:]], axis=2)
        y = jax.lax.conv_transpose(
            jnp.transpose(joined, (0, 1, 3, 2)), w2, (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, 2:-1, 1:, :] + b2
        yb = jnp.transpose(y, (0, 1, 3, 2))
        return (yb.reshape(batch, 2 * f_in * c2out, n_time),
                _partials_ref(yb))

    def fused_fn(x, s, w2, b2, adx, acx, c0x, ax, ads, acs, c0s, a_s):
        return cb.deconv_block_train(
            f_in, c2x, c2s, c2out, True,
            x, s, w2, b2, adx, acx, c0x, ax, ads, acs, c0s, a_s)

    args = (x, s, w2, b2, adx, acx, c0x, ax, ads, acs, c0s, a_s)
    ky, kp = jax.random.split(jax.random.fold_in(key, 20))
    gy = jax.random.normal(ky, (batch, 2 * f_in * c2out, n_time))
    gp = jax.random.normal(kp, (batch, 2 * f_in * c2out, 8))

    y_ref, p_ref = ref_fn(*args)
    y_fused, p_fused = fused_fn(*args)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    _, vjp_ref = jax.vjp(ref_fn, *args)
    _, vjp_fused = jax.vjp(fused_fn, *args)
    names = ("x", "skip", "w2", "b2", "adx", "acx", "c0x", "alpha_x",
             "ads", "acs", "c0s", "alpha_s")
    for name, a, b in zip(names, vjp_ref((gy, gp)), vjp_fused((gy, gp))):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=f"grad mismatch: {name}")
