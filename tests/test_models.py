"""Model-zoo forward/backward smoke tests.

Plays the role of the reference's per-model ``__main__`` blocks (random
input -> forward -> shape check, SURVEY §4), plus a gradient-finiteness
check the reference lacks. Small configs keep CPU runtime sane.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_tpu.config import Config
from speech_enhancement_tpu.models import build_model, model_names, param_megabytes

SR = 16000
SEG = 0.5  # seconds (1-core CPU CI: keep shapes small)


def _stft_shape(n_fft=256, hop=128, t_samples=int(SR * SEG)):
    f = n_fft // 2 + 1
    frames = t_samples // hop + 1
    return f, frames


def _forward(cfg_dict, x, rng_seed=0, n_expected_extra_rngs=False):
    model, spec = build_model(Config(cfg_dict))
    rngs = {"params": jax.random.PRNGKey(rng_seed), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    out = model.apply(variables, x, train=False)
    return model, spec, variables, out


def _grad_ok(model, variables, x):
    def loss(params):
        v = dict(variables, params=params)
        out, _ = model.apply(
            v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
        )
        return jnp.mean(out**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_registry_names():
    names = model_names()
    for expected in ["dnn", "mel-rnn", "rnn-stft-mask", "crn", "unet", "dcunet",
                     "dccrn", "wav-unet", "demucs", "conv-tasnet", "sepformer", "tcn"]:
        assert expected in names


def test_mel_rnn_forward(rng):
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((2, 1, f, t, 2)).astype(np.float32))
    cfg = {"name": "mel-rnn", "n_fft": 256, "n_mels": 32, "rnn_hidden": 32,
           "rnn_layer": 1, "rnn_type": "lstm", "sample_rate": SR}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == x.shape
    assert spec.domain == "stft" and spec.monarch
    _grad_ok(model, variables, x)


def test_mel_rnn_no_mel(rng):
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((2, 1, f, t, 2)).astype(np.float32))
    cfg = {"name": "mel-rnn", "n_fft": 256, "n_mels": 0, "rnn_hidden": 32,
           "rnn_layer": 1, "rnn_type": "gru", "sample_rate": SR}
    _, _, _, out = _forward(cfg, x)
    assert out.shape == x.shape


def test_rnn_stft_mask_multi_speaker(rng):
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((2, 2, f, t, 2)).astype(np.float32))
    cfg = {"name": "rnn-stft-mask", "num_spk": 2, "n_fft": 256, "rnn_hidden": 32,
           "rnn_layer": 2, "rnn_type": "lstm", "bidirectional": True, "drop_out": 0.2}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == (2, 2, 2, f, t, 2)  # [B, S, C, F, T, 2]
    assert spec.multi_speaker
    _grad_ok(model, variables, x)


def test_rnn_stft_mask_bf16_compute(rng):
    # dtype knob: bf16 recurrence (TPU fast path), f32 params/output
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((2, 2, f, t, 2)).astype(np.float32))
    cfg = {"name": "rnn-stft-mask", "num_spk": 2, "n_fft": 256, "rnn_hidden": 32,
           "rnn_layer": 2, "rnn_type": "lstm", "bidirectional": True,
           "drop_out": 0.2, "dtype": "bfloat16"}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == (2, 2, 2, f, t, 2) and out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    assert jax.tree_util.tree_leaves(variables["params"])[0].dtype == jnp.float32
    _grad_ok(model, variables, x)


def test_crn_forward(rng):
    # CRN hardcodes the n_fft=512 geometry (1792-wide LSTM)
    f, t = 257, 12
    x = jnp.asarray(rng.standard_normal((1, 1, f, t, 2)).astype(np.float32) * 0.1)
    model, spec, variables, out = _forward({"name": "crn"}, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))  # amplitude fix: no NaN
    _grad_ok(model, variables, x)


def test_crn_compat_quirk_nans(rng):
    f, t = 257, 12
    x = jnp.asarray(rng.standard_normal((1, 1, f, t, 2)).astype(np.float32))
    model, spec, variables, out = _forward({"name": "crn", "amplitude_compat": True}, x)
    assert np.isnan(np.asarray(out)).any()  # reproduces the reference NaN bug


def test_unet_forward(rng):
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((1, 1, f, t, 2)).astype(np.float32))
    cfg = {"name": "unet", "unet_channels": 1, "unet_layer": 3, "bilinear": False}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == x.shape
    _grad_ok(model, variables, x)


def test_unet_bilinear(rng):
    f, t = _stft_shape()
    x = jnp.asarray(rng.standard_normal((1, 1, f, t, 2)).astype(np.float32))
    cfg = {"name": "unet", "unet_channels": 1, "unet_layer": 2, "bilinear": True}
    _, _, _, out = _forward(cfg, x)
    assert out.shape == x.shape


def test_wav_unet_forward(rng):
    t = 4096  # divisible by 2**nlayers
    x = jnp.asarray(rng.standard_normal((2, 1, t)).astype(np.float32))
    cfg = {"name": "wav-unet", "unet_nlayers": 6, "channels_interval": 8}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == x.shape
    assert spec.domain == "wav"
    _grad_ok(model, variables, x)


def test_dccrn_forward(rng):
    t = 4000
    x = jnp.asarray(rng.standard_normal((1, 1, t)).astype(np.float32) * 0.1)
    cfg = {"name": "dccrn", "kernel_num": [8, 16, 32, 32, 64, 64], "rnn_units": 32}
    model, spec, variables, out = _forward(cfg, x)
    assert out.shape == x.shape
    assert np.abs(np.asarray(out)).max() <= 1.0  # clamp
    _grad_ok(model, variables, x)


@pytest.mark.parametrize("mode", ["C", "R"])
def test_dccrn_masking_modes(rng, mode):
    x = jnp.asarray(rng.standard_normal((1, 1, 8000)).astype(np.float32) * 0.1)
    cfg = {"name": "dccrn", "kernel_num": [4, 8, 8, 16, 16, 32], "rnn_units": 16,
           "masking_mode": mode}
    _, _, _, out = _forward(cfg, x)
    assert out.shape == x.shape


def test_dccrn_conv_stft_roundtrip(rng):
    from speech_enhancement_tpu.models.dccrn import conv_istft, conv_stft

    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.3)
    spec = conv_stft(x, 400, 100, 512)
    assert spec.shape == (2, 514, 8000 // 100 + 2 * 3 + 1 - 4)
    back = conv_istft(spec, 400, 100, 512, 8000)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3)


def test_dccrn_reference_size():
    # default config should land near the reference's published 9.39 MB
    model, spec = build_model(Config({"name": "dccrn"}))
    x = jnp.zeros((1, 1, 1200), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    mb = param_megabytes(variables["params"])
    assert 7.0 < mb < 12.0, mb


def test_dccrn_remat_policy_grads_match(rng):
    """remat_policy named saves change the recompute schedule, not the math:
    gradients must be bit-identical to plain remat (and to no remat)."""
    import optax

    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    x = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32) * 0.1)
    target = x * 0.9
    kwargs = dict(kernel_num=(4, 8, 8, 16, 16, 32), rnn_units=16)
    base = DCCRN(remat=True, **kwargs)
    variables = base.init(jax.random.PRNGKey(0), x)

    def grads_of(model):
        def loss_of(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return mse_loss(out, target)

        return jax.jit(jax.grad(loss_of))(variables["params"])

    g_plain = grads_of(base)
    g_policy = grads_of(
        DCCRN(remat=True, remat_policy="conv_out,cbn_stats", **kwargs)
    )
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_policy)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_models_smoke_cli():
    """python -m speech_enhancement_tpu.models <name> — the zoo-wide
    equivalent of the reference's per-model __main__ smoke blocks
    (e.g. src/model/dccrn.py:749-807)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "speech_enhancement_tpu.models", "mel-rnn",
         "--seconds", "0.3"],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr
    assert "mel-rnn" in proc.stdout and "params" in proc.stdout
