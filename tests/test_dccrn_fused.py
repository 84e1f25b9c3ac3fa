"""DCCRN fused-kernel execution path vs the XLA path: same params, same math.

``use_fused_blocks="force"`` runs the Pallas block kernels in interpret mode
on CPU. The parameter tree must be identical (checkpoint compatibility) and
forward outputs must agree in both eval (running stats) and train (batch
stats + running-stat updates) modes, within f32 rounding of the folded-CBN
reformulation (same tolerance class as the cbn_fold flag).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.models.dccrn import DCCRN

KW = dict(
    win_len=128, win_inc=32, fft_len=256,
    kernel_num=(4, 8, 8, 16, 16, 16), rnn_layers=2, rnn_units=16,
    use_pallas_stft=False, use_pallas_mask=False,
)


@pytest.fixture(scope="module")
def wav():
    key = jax.random.PRNGKey(3)
    return jax.random.normal(key, (2, 1, 1600)) * 0.1


@pytest.fixture(scope="module")
def variables(wav):
    model = DCCRN(**KW)
    return model.init(jax.random.PRNGKey(0), wav)


def test_param_tree_identical(wav, variables):
    fused = DCCRN(use_fused_blocks="force", **KW)
    v2 = fused.init(jax.random.PRNGKey(0), wav)
    flat1 = jax.tree_util.tree_leaves_with_path(variables)
    flat2 = jax.tree_util.tree_leaves_with_path(v2)
    paths1 = [jax.tree_util.keystr(p) for p, _ in flat1]
    paths2 = [jax.tree_util.keystr(p) for p, _ in flat2]
    assert paths1 == paths2
    for (_, a), (_, b) in zip(flat1, flat2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg="init values must match (same RNG fold)")


def test_eval_forward_matches(wav, variables):
    y_xla = DCCRN(**KW).apply(variables, wav, train=False)
    y_fused = DCCRN(use_fused_blocks="force", **KW).apply(
        variables, wav, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               rtol=1e-4, atol=1e-5)


def test_train_forward_and_stats_match(wav, variables):
    y_xla, mut_xla = DCCRN(**KW).apply(
        variables, wav, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    y_fused, mut_fused = DCCRN(use_fused_blocks="force", **KW).apply(
        variables, wav, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               rtol=1e-3, atol=1e-4)
    leaves_x = jax.tree_util.tree_leaves_with_path(mut_xla["batch_stats"])
    leaves_f = jax.tree_util.tree_leaves_with_path(mut_fused["batch_stats"])
    assert [jax.tree_util.keystr(p) for p, _ in leaves_x] == [
        jax.tree_util.keystr(p) for p, _ in leaves_f]
    for (path, a), (_, b) in zip(leaves_x, leaves_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"batch stat mismatch at {jax.tree_util.keystr(path)}")


def test_train_gradients_match(wav, variables):
    """Full-model gradient parity: custom-VJP fused path vs XLA autodiff."""
    target = wav * 0.5

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                wav, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean((out - target) ** 2)
        return f

    g_xla = jax.grad(loss_fn(DCCRN(**KW)))(variables["params"])
    g_fused = jax.grad(loss_fn(DCCRN(use_fused_blocks="force", **KW)))(
        variables["params"])
    leaves_x = jax.tree_util.tree_leaves_with_path(g_xla)
    leaves_f = jax.tree_util.tree_leaves_with_path(g_fused)
    assert [jax.tree_util.keystr(p) for p, _ in leaves_x] == [
        jax.tree_util.keystr(p) for p, _ in leaves_f]
    global_scale = max(
        float(np.abs(np.asarray(v)).max()) for _, v in leaves_x)
    for (path, a), (_, b) in zip(leaves_x, leaves_f):
        a, b = np.asarray(a), np.asarray(b)
        name = jax.tree_util.keystr(path)
        zero_grad_bias = (("['br']" in name or "['bi']" in name)
                          and "dec_5" not in name)
        if zero_grad_bias:
            # a conv bias followed by CBN has exactly-zero true gradient
            # (mean subtraction cancels it); both paths produce only f32
            # cancellation residue, so compare against the global scale.
            scale = global_scale
        else:
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-3,
            err_msg=f"grad mismatch at {name}")
