"""Norm + EMA + PCEN tests (reference: conv_tasnet.py:439-487, ema.py:24-40)."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.ops.norms import (
    EMA,
    PCEN,
    ChannelwiseLayerNorm,
    CumulativeLayerNorm,
    GlobalLayerNorm,
    ema_scan,
)


def test_gln_statistics(rng):
    x = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32) * 3 + 1)
    mod = GlobalLayerNorm()
    out = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
    out = np.asarray(out)
    for b in range(2):
        assert abs(out[b].mean()) < 1e-5
        assert abs(out[b].std() - 1.0) < 1e-3


def test_cln_statistics(rng):
    x = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32) * 2 - 3)
    mod = ChannelwiseLayerNorm()
    out = np.asarray(mod.apply(mod.init(jax.random.PRNGKey(0), x), x))
    np.testing.assert_allclose(out.mean(axis=-1), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=-1), 1, atol=1e-3)


def test_cumulative_ln_causal(rng):
    x = rng.standard_normal((1, 40, 8)).astype(np.float32)
    mod = CumulativeLayerNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    base = np.asarray(mod.apply(params, jnp.asarray(x)))
    # causality: changing the future must not change the past
    x2 = x.copy()
    x2[:, 25:] += 10
    out2 = np.asarray(mod.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(out2[:, :25], base[:, :25], atol=1e-5)
    # last frame stats match global stats
    np.testing.assert_allclose(
        base[0, -1],
        (x[0, -1] - x.mean()) / np.sqrt(x.var() + 1e-8),
        atol=1e-4,
    )


def test_ema_matches_reference_loop(rng):
    # reference loop: y_0 = a*x_0; y_t = (1-a)*y_{t-1} + a*x_t (ema.py:29-38)
    x = rng.standard_normal((2, 37, 5)).astype(np.float32)
    alpha = 0.1
    want = np.zeros_like(x)
    buf = np.zeros((2, 5), np.float32)
    for t in range(37):
        buf = (1 - alpha) * buf + alpha * x[:, t]
        want[:, t] = buf
    got = np.asarray(ema_scan(jnp.asarray(x), alpha, axis=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ema_module_trainable(rng):
    x = jnp.asarray(rng.standard_normal((1, 20, 4)).astype(np.float32))
    mod = EMA(alpha=0.3, trainable=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    assert "alpha_logit" in params["params"]
    out = mod.apply(params, x)
    ref = ema_scan(x, 0.3, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pcen_shapes_and_grad(rng):
    x = jnp.asarray(np.abs(rng.standard_normal((2, 30, 10))).astype(np.float32))
    mod = PCEN(spcen=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape

    def loss(p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
