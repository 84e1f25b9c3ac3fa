"""Resident-weight Pallas LSTM (ops/pallas/lstm.py) vs the lax.scan path.

The kernel must be a drop-in for LSTMLayer: identical params, identical
outputs, identical gradients (custom VJP), in both directions and through
the bidirectional RNNStack — CPU interpret mode (fused="force")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.ops.rnn import LSTMLayer, RNNStack

B, T, D, H = 3, 9, 128, 128


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_matches_scan(x, reverse):
    scan = LSTMLayer(H, reverse=reverse)
    fused = LSTMLayer(H, reverse=reverse, fused="force")
    params = scan.init(jax.random.PRNGKey(0), x)
    out_s, (h_s, c_s) = scan.apply(params, x)
    out_f, (h_f, c_f) = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_s), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_s), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_grads_match_scan(x, reverse):
    scan = LSTMLayer(H, reverse=reverse)
    fused = LSTMLayer(H, reverse=reverse, fused="force")
    params = scan.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def fn(p, xin):
            out, (h_last, c_last) = model.apply(p, xin)
            # nonlinear reductions exercise every cotangent path, incl.
            # the h_last/c_last edges
            return (jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(h_last))
                    + jnp.sum(jnp.tanh(c_last)))
        return fn

    g_s = jax.grad(loss(scan), argnums=(0, 1))(params, x)
    g_f = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   rtol=2e-4)


def test_init_state_roundtrip(x, rng):
    """Streaming contract: a caller-held (h, c) state resumes exactly."""
    scan = LSTMLayer(H)
    fused = LSTMLayer(H, fused="force")
    params = scan.init(jax.random.PRNGKey(0), x)
    state = tuple(
        jnp.asarray(rng.standard_normal((B, H)).astype(np.float32)) * 0.1
        for _ in range(2))
    out_s, st_s = scan.apply(params, x, state)
    out_f, st_f = fused.apply(params, x, state)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(st_s, st_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-5)


def test_rnnstack_bidirectional(x):
    stack = RNNStack("lstm", H, num_layers=2, bidirectional=True)
    fused = RNNStack("lstm", H, num_layers=2, bidirectional=True,
                     fused="force")
    params = stack.init(jax.random.PRNGKey(1), x)
    out_s = stack.apply(params, x)
    out_f = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=1e-5, rtol=1e-5)


def test_bf16_path_close(x):
    """bf16 compute dtype: fused vs scan stay within bf16 noise."""
    scan = LSTMLayer(H, dtype=jnp.bfloat16)
    fused = LSTMLayer(H, dtype=jnp.bfloat16, fused="force")
    params = scan.init(jax.random.PRNGKey(0), x)
    out_s, _ = scan.apply(params, x)
    out_f, _ = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_s, np.float32), atol=3e-2)


def test_unaligned_hidden_falls_back(x):
    """H not lane-aligned: the flag silently keeps the scan path."""
    fused = LSTMLayer(96, fused="force")
    params = fused.init(jax.random.PRNGKey(0), x)
    out, _ = fused.apply(params, x)
    assert out.shape == (B, T, 96)
