"""Complex-op tests: combination rule, BN whitening, transpose shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ops.complex_ops import (
    ComplexBatchNorm,
    ComplexBatchNormSimple,
    ComplexConv2d,
    ComplexConvTranspose2d,
    ComplexDense,
)


def test_complex_dense_is_complex_multiply(rng):
    xr = rng.standard_normal((4, 6)).astype(np.float32)
    xi = rng.standard_normal((4, 6)).astype(np.float32)
    mod = ComplexDense(5, use_bias=False)
    params = mod.init(jax.random.PRNGKey(0), (jnp.asarray(xr), jnp.asarray(xi)))
    or_, oi_ = mod.apply(params, (jnp.asarray(xr), jnp.asarray(xi)))
    wr = np.asarray(params["params"]["dense_r"]["kernel"])
    wi = np.asarray(params["params"]["dense_i"]["kernel"])
    want = (xr + 1j * xi) @ (wr + 1j * wi)
    np.testing.assert_allclose(np.asarray(or_), want.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(oi_), want.imag, atol=1e-5)


def test_complex_conv_matches_complex_arith(rng):
    xr = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    mod = ComplexConv2d(3, (3, 3), use_bias=False)
    params = mod.init(jax.random.PRNGKey(1), (xr, xi))
    or_, oi_ = mod.apply(params, (xr, xi))
    # real input, imaginary kernel path check: conv(i*x) = i * conv(x)
    zr, zi = mod.apply(params, (jnp.zeros_like(xr), xr))
    rr, ri = mod.apply(params, (xr, jnp.zeros_like(xr)))
    np.testing.assert_allclose(np.asarray(zr), -np.asarray(ri), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zi), np.asarray(rr), atol=1e-5)
    assert or_.shape == (1, 8, 8, 3)


def test_complex_conv_transpose_upsamples(rng):
    xr = jnp.asarray(rng.standard_normal((1, 16, 10, 4)).astype(np.float32))
    xi = jnp.zeros_like(xr)
    mod = ComplexConvTranspose2d(2, (3, 2), strides=(2, 1))
    params = mod.init(jax.random.PRNGKey(2), (xr, xi))
    or_, oi_ = mod.apply(params, (xr, xi))
    assert or_.shape[1] > 16  # upsampled in freq


def test_complex_batchnorm_whitens(rng):
    # correlated inputs -> after CBN (train mode, default gamma) the real/imag
    # covariance should be ~ identity/sqrt(2) scaled
    base = rng.standard_normal((512, 4, 4, 3)).astype(np.float32)
    xr = jnp.asarray(base * 2.0 + 1.0)
    xi = jnp.asarray(base * -1.0 + 0.5 + 0.1 * rng.standard_normal((512, 4, 4, 3)).astype(np.float32))
    mod = ComplexBatchNorm()
    variables = mod.init(jax.random.PRNGKey(3), (xr, xi))
    (or_, oi_), mutated = mod.apply(variables, (xr, xi), mutable=["batch_stats"])
    r = np.asarray(or_).reshape(-1, 3)
    i = np.asarray(oi_).reshape(-1, 3)
    g = 1.0 / np.sqrt(2.0)
    for c in range(3):
        cov = np.cov(np.stack([r[:, c], i[:, c]]))
        np.testing.assert_allclose(cov, np.eye(2) * g * g, atol=0.05)
    # running stats updated
    assert not np.allclose(np.asarray(mutated["batch_stats"]["mean_r"]), 0)


def test_complex_batchnorm_inference_uses_running(rng):
    xr = jnp.asarray(rng.standard_normal((64, 2, 2, 2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((64, 2, 2, 2)).astype(np.float32))
    mod = ComplexBatchNorm()
    variables = mod.init(jax.random.PRNGKey(4), (xr, xi))
    out_train, _ = mod.apply(variables, (xr, xi), mutable=["batch_stats"])
    out_eval = mod.apply(variables, (xr, xi), use_running_average=True)
    # initial running stats are the init values, so eval != train output
    assert not np.allclose(np.asarray(out_train[0]), np.asarray(out_eval[0]))


def test_complex_batchnorm_simple(rng):
    xr = jnp.asarray(rng.standard_normal((32, 4, 4, 2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((32, 4, 4, 2)).astype(np.float32))
    mod = ComplexBatchNormSimple()
    variables = mod.init(jax.random.PRNGKey(5), (xr, xi))
    (or_, oi_), _ = mod.apply(variables, (xr, xi), mutable=["batch_stats"])
    assert abs(float(jnp.mean(or_))) < 1e-5


def test_stacked_cbn_matches_pair_cbn(rng):
    from speech_enhancement_tpu.ops.complex_ops import ComplexBatchNormStacked

    xr = jnp.asarray(rng.standard_normal((64, 4, 4, 6)).astype(np.float32) * 2 + 1)
    xi = jnp.asarray(rng.standard_normal((64, 4, 4, 6)).astype(np.float32) - 0.5)
    pair = ComplexBatchNorm()
    stacked = ComplexBatchNormStacked()
    vp = pair.init(jax.random.PRNGKey(0), (xr, xi))
    vs = stacked.init(jax.random.PRNGKey(0), jnp.concatenate([xr, xi], axis=-1))
    # copy affine params so both use identical gammas/betas
    vs = {"params": vp["params"], "batch_stats": vs["batch_stats"]}
    (pr, pi), _ = pair.apply(vp, (xr, xi), mutable=["batch_stats"])
    s_out, mutated = stacked.apply(
        vs, jnp.concatenate([xr, xi], axis=-1), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(s_out[..., :6]), np.asarray(pr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_out[..., 6:]), np.asarray(pi), atol=2e-5)
    # eval mode with updated running stats also matches
    vp2 = {"params": vp["params"],
           "batch_stats": pair.apply(vp, (xr, xi), mutable=["batch_stats"])[1]["batch_stats"]}
    vs2 = {"params": vp["params"], "batch_stats": mutated["batch_stats"]}
    pr2, pi2 = pair.apply(vp2, (xr, xi), use_running_average=True)
    s2 = stacked.apply(vs2, jnp.concatenate([xr, xi], axis=-1), use_running_average=True)
    np.testing.assert_allclose(np.asarray(s2[..., :6]), np.asarray(pr2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s2[..., 6:]), np.asarray(pi2), atol=2e-5)


def test_folded_cbn_matches_centered(rng):
    # fold=True evaluates the same whitening+affine via per-channel folded
    # coefficients and one-pass moments; in f32 the two formulations must
    # agree tightly (train stats AND running-average paths).
    from speech_enhancement_tpu.ops.complex_ops import ComplexBatchNorm

    x = (
        jnp.asarray(rng.standard_normal((4, 6, 10, 8)).astype(np.float32)) * 1.7 + 0.4,
        jnp.asarray(rng.standard_normal((4, 6, 10, 8)).astype(np.float32)) * 0.6 - 0.2,
    )
    ref_mod = ComplexBatchNorm(fold=False)
    fold_mod = ComplexBatchNorm(fold=True)
    variables = ref_mod.init(jax.random.PRNGKey(0), x)

    (ref_r, ref_i), ref_stats = ref_mod.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )
    (fr, fi), fold_stats = fold_mod.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(fr), np.asarray(ref_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(ref_i), atol=2e-5)
    for key in ("mean_r", "vrr", "vri"):
        np.testing.assert_allclose(
            np.asarray(fold_stats["batch_stats"][key]),
            np.asarray(ref_stats["batch_stats"][key]), atol=2e-5,
        )

    # inference path with shared running stats
    vars_ra = {"params": variables["params"], **ref_stats}
    ra_ref = ref_mod.apply(vars_ra, x, use_running_average=True)
    ra_fold = fold_mod.apply(vars_ra, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(ra_fold[0]), np.asarray(ra_ref[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ra_fold[1]), np.asarray(ra_ref[1]), atol=2e-5)


def test_dccrn_fold_remat_match_baseline(rng):
    # cbn_fold / remat are pure performance knobs: same forward outputs
    # (f32, same params) as the baseline DCCRN within float tolerance.
    from speech_enhancement_tpu.models.dccrn import DCCRN

    x = jnp.asarray(rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.1)
    base = DCCRN(kernel_num=(8, 16), rnn_layers=1, rnn_units=16)
    variables = base.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    out_base, _ = base.apply(variables, x, train=True, mutable=["batch_stats"])
    for knobs in ({"cbn_fold": True}, {"remat": True},
                  {"cbn_fold": True, "remat": True}):
        variant = DCCRN(kernel_num=(8, 16), rnn_layers=1, rnn_units=16, **knobs)
        out_v, _ = variant.apply(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(out_v), np.asarray(out_base), atol=3e-5,
            err_msg=f"DCCRN variant {knobs} diverged from baseline",
        )


def test_dccrn_nchw_layout_matches_nhwc(rng):
    # layout="nchw" (time-in-lanes) is a pure performance knob: identical
    # params and outputs to the default channels-last layout.
    import jax

    from speech_enhancement_tpu.models.dccrn import DCCRN

    x = jnp.asarray(rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.1)
    base = DCCRN(kernel_num=(8, 16), rnn_layers=1, rnn_units=16)
    variables = base.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    nchw = DCCRN(kernel_num=(8, 16), rnn_layers=1, rnn_units=16, layout="nchw")
    out_a, _ = base.apply(variables, x, train=True, mutable=["batch_stats"])
    out_b, _ = nchw.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    shapes_a = jax.tree_util.tree_map(lambda t: t.shape, variables["params"])
    shapes_b = jax.tree_util.tree_map(
        lambda t: t.shape,
        nchw.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x)["params"],
    )
    assert shapes_a == shapes_b
