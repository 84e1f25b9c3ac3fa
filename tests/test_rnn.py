"""Scan-RNN parity tests: load torch nn.LSTM/GRU weights, compare outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from speech_enhancement_tpu.ops.rnn import (
    ComplexLSTM,
    GRULayer,
    LSTMLayer,
    RNNStack,
)


def _lstm_params_from_torch(mod):
    return {
        "w_ih": jnp.asarray(mod.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(mod.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(mod.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(mod.bias_hh_l0.detach().numpy()),
    }


def test_lstm_matches_torch(rng):
    torch.manual_seed(0)
    d, h, b, t = 12, 16, 3, 25
    ref = torch.nn.LSTM(d, h, batch_first=True)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    layer = LSTMLayer(h)
    params = {"params": _lstm_params_from_torch(ref)}
    got, _ = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_lstm_reverse_matches_torch(rng):
    torch.manual_seed(1)
    d, h, b, t = 8, 10, 2, 17
    ref = torch.nn.LSTM(d, h, batch_first=True)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x[:, ::-1].copy()))
    want = want.numpy()[:, ::-1]
    layer = LSTMLayer(h, reverse=True)
    got, _ = layer.apply({"params": _lstm_params_from_torch(ref)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_gru_matches_torch(rng):
    torch.manual_seed(2)
    d, h, b, t = 9, 11, 2, 19
    ref = torch.nn.GRU(d, h, batch_first=True)
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))
    layer = GRULayer(h)
    params = {
        "params": {
            "w_ih": jnp.asarray(ref.weight_ih_l0.detach().numpy().T),
            "w_hh": jnp.asarray(ref.weight_hh_l0.detach().numpy().T),
            "b_ih": jnp.asarray(ref.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(ref.bias_hh_l0.detach().numpy()),
        }
    }
    got = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_bidirectional_stack_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 30, 20)).astype(np.float32))
    stack = RNNStack(rnn_type="lstm", hidden_size=24, num_layers=3, bidirectional=True)
    params = stack.init(jax.random.PRNGKey(0), x)
    out = stack.apply(params, x)
    assert out.shape == (2, 30, 48)
    stack_uni = RNNStack(rnn_type="gru", hidden_size=24, num_layers=2)
    params = stack_uni.init(jax.random.PRNGKey(0), x)
    assert stack_uni.apply(params, x).shape == (2, 30, 24)


def test_complex_lstm_cross_combination(rng):
    # out_r = Lr(xr) - Li(xi); out_i = Lr(xi) + Li(xr)  (dccrn.py:288-293)
    xr = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    model = ComplexLSTM(hidden_size=16, projection_dim=8)
    params = model.init(jax.random.PRNGKey(0), xr, xi)
    out_r, out_i = model.apply(params, xr, xi)
    assert out_r.shape == (2, 10, 8) and out_i.shape == (2, 10, 8)
    # with zero imaginary input, out_i should be exactly proj_i(Li(xr))
    zr, zi = model.apply(params, xr, jnp.zeros_like(xi))
    assert np.abs(np.asarray(zi)).max() > 0  # cross term alive


def test_rnn_stack_bf16_close_to_f32(rng):
    # compute-dtype knob: same params, bf16 recurrence tracks the f32 one
    # (params stay float32; only compute is cast). Covers lstm/gru/rnn.
    x = jnp.asarray(rng.standard_normal((2, 40, 20)).astype(np.float32))
    for rnn_type in ("lstm", "gru", "rnn"):
        f32 = RNNStack(rnn_type=rnn_type, hidden_size=24, num_layers=2,
                       bidirectional=True)
        bf16 = RNNStack(rnn_type=rnn_type, hidden_size=24, num_layers=2,
                        bidirectional=True, dtype=jnp.bfloat16, unroll=4)
        params = f32.init(jax.random.PRNGKey(0), x)
        a = np.asarray(f32.apply(params, x), np.float32)
        b = np.asarray(bf16.apply(params, x), np.float32)
        assert b.dtype == np.float32 or b.dtype == np.dtype("bfloat16")
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() / scale < 0.05, rnn_type
        # params untouched by the compute cast
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32
