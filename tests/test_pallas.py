"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np

from speech_enhancement_tpu.models.dccrn import _stft_bases
from speech_enhancement_tpu.ops.pallas.stft import stft_pallas
from speech_enhancement_tpu.ops.stft import _rfft_basis, hann_window


def test_stft_pallas_matches_conv_stft(rng):
    # DCCRN geometry: win 400 / hop 100 / fft 512 (basis includes window)
    fwd, _, _ = _stft_bases(400, 512)  # [400, 514]
    x = rng.standard_normal((2, 16000 + 600)).astype(np.float32) * 0.3
    got = np.asarray(stft_pallas(jnp.asarray(x), fwd, 100, 400, interpret=True))
    # reference computation: explicit framing + matmul
    n_frames = (x.shape[1] - 400) // 100 + 1
    starts = np.arange(n_frames) * 100
    frames = np.stack([x[:, s : s + 400] for s in starts], axis=1)
    want = frames @ fwd
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_pallas_matches_stft_custom_geometry(rng):
    # stft_custom geometry: win 512 / hop 128, Hann window folded into basis
    br, bi = _rfft_basis(512)
    window = np.asarray(hann_window(512))
    basis = np.concatenate([br, bi], axis=1) * window[:, None]  # [512, 514]
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    got = np.asarray(stft_pallas(jnp.asarray(x), basis, 128, 512, interpret=True))
    n_frames = (32000 - 512) // 128 + 1
    starts = np.arange(n_frames) * 128
    frames = np.stack([x[:, s : s + 512] for s in starts], axis=1) * window
    want = np.concatenate([frames @ br, frames @ bi], axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_stft_pallas_non_block_multiple_frames(rng):
    fwd, _, _ = _stft_bases(400, 512)
    # frame count deliberately not a multiple of FRAMES_PER_BLOCK
    x = rng.standard_normal((1, 7000)).astype(np.float32)
    got = np.asarray(stft_pallas(jnp.asarray(x), fwd, 100, 400, interpret=True))
    assert got.shape == ((7000 - 400) // 100 + 1, 514)[0:1] + got.shape[1:] or True
    n_frames = (7000 - 400) // 100 + 1
    assert got.shape == (1, n_frames, 514)


def test_mask_e_kernel_matches_reference_math(rng):
    from speech_enhancement_tpu.ops.pallas.masking import apply_mask_e

    B, F, T = 1, 257, 130
    xr, xi, mr, mi = (
        jnp.asarray(rng.standard_normal((B, F, T)).astype(np.float32))
        for _ in range(4)
    )
    m = np.sqrt(np.asarray(mr) ** 2 + np.asarray(mi) ** 2)
    ph_m = np.arctan2(np.asarray(mi) / (m + 1e-8), np.asarray(mr) / (m + 1e-8))
    s = np.sqrt(np.asarray(xr) ** 2 + np.asarray(xi) ** 2 + 1e-8)
    ph_x = np.arctan2(np.asarray(xi), np.asarray(xr))
    est = np.tanh(m) * s
    want_r = est * np.cos(ph_x + ph_m)
    want_i = est * np.sin(ph_x + ph_m)
    got_r, got_i = apply_mask_e(xr, xi, mr, mi, interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), want_r, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_i), want_i, atol=5e-4)


def test_dccrn_pallas_mask_path(rng):
    from speech_enhancement_tpu.config import Config
    from speech_enhancement_tpu.models import build_model

    x = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32) * 0.1)
    cfg = {"name": "dccrn", "kernel_num": [4, 8, 8, 16, 16, 32], "rnn_units": 16}
    model_ref, _ = build_model(Config(cfg))
    model_pl, _ = build_model(Config(dict(cfg, use_pallas_mask="force")))
    import jax as _jax

    variables = model_ref.init(_jax.random.PRNGKey(0), x)
    a = np.asarray(model_ref.apply(variables, x, train=False))
    b = np.asarray(model_pl.apply(variables, x, train=False))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_dccrn_pallas_stft_path(rng):
    # use_pallas_stft swaps the inference front-end for the fused kernel;
    # output must match the matmul ConvSTFT path.
    import jax as _jax

    from speech_enhancement_tpu.config import Config
    from speech_enhancement_tpu.models import build_model

    x = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32) * 0.1)
    cfg = {"name": "dccrn", "kernel_num": [4, 8, 8, 16, 16, 32], "rnn_units": 16}
    model_ref, _ = build_model(Config(cfg))
    model_pl, _ = build_model(Config(dict(cfg, use_pallas_stft="force")))
    variables = model_ref.init(_jax.random.PRNGKey(0), x)
    a = np.asarray(model_ref.apply(variables, x, train=False))
    b = np.asarray(model_pl.apply(variables, x, train=False))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_stft_method_pallas_matches_fft(rng):
    # ops/stft.py stft(method="pallas") matches the fft path (torch
    # conventions incl. center reflect pad; scaling handled by callers).
    from speech_enhancement_tpu.ops.stft import stft

    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    want = np.asarray(stft(x, 512, 128, 512, method="fft"))
    got = np.asarray(stft(x, 512, 128, 512, method="pallas"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got.real, want.real, atol=2e-3)
    np.testing.assert_allclose(got.imag, want.imag, atol=2e-3)


def test_stft_pallas_diff_grads_match_matmul(rng):
    """stft_pallas_diff's custom VJP vs autodiff of the explicit
    framing+matmul composition (the training-path ground truth)."""
    import jax

    from speech_enhancement_tpu.ops.frame import frame_signal
    from speech_enhancement_tpu.ops.pallas.stft import stft_pallas_diff

    fwd, _, _ = _stft_bases(400, 512)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32)) * 0.3
    basis = jnp.asarray(fwd)

    def ref_loss(x):
        frames = frame_signal(x, 400, 100, center=False)
        spec = jnp.matmul(frames, basis)
        return jnp.sum(jnp.sin(spec))  # nonlinear reduce: exercises g fully

    def pallas_loss(x):
        spec = stft_pallas_diff(x, fwd, 100, 400, True)
        return jnp.sum(jnp.sin(spec))

    g_ref = jax.grad(ref_loss)(x)
    g_pl = jax.grad(pallas_loss)(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)


def test_mask_e_diff_grads_match_xla(rng):
    import jax

    from speech_enhancement_tpu.ops.pallas.masking import (_mask_e_ref,
                                                           apply_mask_e_diff)

    B, F, T = 1, 16, 64
    args = tuple(
        jnp.asarray(rng.standard_normal((B, F, T)).astype(np.float32))
        for _ in range(4)
    )

    def ref_loss(*a):
        orr, oi = _mask_e_ref(*a)
        return jnp.sum(orr * orr) + jnp.sum(jnp.abs(oi))

    def pl_loss(*a):
        orr, oi = apply_mask_e_diff(*a, True)
        return jnp.sum(orr * orr) + jnp.sum(jnp.abs(oi))

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(*args)
    g_pl = jax.grad(pl_loss, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-4)


def test_dccrn_pallas_train_step_finite(rng):
    """Full DCCRN train-mode grads with the Pallas STFT + mask front-end
    forced on (custom VJPs active): finite loss and gradients."""
    import jax

    from speech_enhancement_tpu.models.dccrn import DCCRN

    model = DCCRN(use_pallas_stft="force", use_pallas_mask="force",
                  kernel_num=(8, 16), rnn_layers=1, rnn_units=16)
    x = jnp.asarray(rng.standard_normal((2, 1, 1600)).astype(np.float32)) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean((out - x) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)


def test_fused_mha_matches_xla_attention(rng):
    """ops/pallas/attention.fused_mha vs plain softmax attention: forward
    and gradients (custom VJP recomputes scores in VMEM)."""
    import jax

    from speech_enhancement_tpu.ops.pallas.attention import fused_mha

    B, H, L, D = 2, 3, 50, 16  # L, D both off the 128 grid: exercises padding
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, D)).astype(np.float32))
               for _ in range(3))

    def ref(q, k, v):
        s = jnp.einsum("bhld,bhmd->bhlm", q, k) / np.sqrt(D)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhlm,bhmd->bhld", p, v)

    got = fused_mha(q, k, v, 0.0, True)
    want = ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss_f(fn):
        return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

    g_ref = jax.grad(loss_f(ref), argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_f(lambda q, k, v: fused_mha(q, k, v, 0.0, True)),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_sepformer_fused_attention_param_twin(rng):
    """Sepformer fused_attention='force' shares the exact param tree with
    the XLA MHA path and produces the same outputs + finite grads."""
    import jax

    from speech_enhancement_tpu.models.sepformer import Sepformer

    kwargs = dict(encoder_out_nchannels=32, masknet_chunksize=50,
                  masknet_numlayers=1, intra_numlayers=1, inter_numlayers=1,
                  intra_nhead=4, inter_nhead=4, intra_dffn=64, inter_dffn=64)
    x = jnp.asarray(rng.standard_normal((1, 1, 1500)).astype(np.float32) * 0.1)
    xla_model = Sepformer(fused_attention=False, **kwargs)
    fused_model = Sepformer(fused_attention="force", **kwargs)
    variables = xla_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    fused_vars = fused_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    # identical trees: same treedef and leaf shapes
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_vars))

    out_xla = xla_model.apply(variables, x, train=False)
    out_fused = fused_model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               atol=2e-5, rtol=1e-4)

    def loss_of(p):
        out = fused_model.apply({"params": p}, x, train=True,
                                rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_of)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
