"""Loss tests, golden-valued against the reference formulas (src/loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from speech_enhancement_tpu.train import losses


def _ref_si_snr(s1, s2, eps=1e-8):
    # Literal port of the reference formula (src/loss.py:17-29) for testing.
    t1, t2 = torch.from_numpy(s1), torch.from_numpy(s2)
    s1_s2 = torch.sum(t1 * t2, -1, keepdim=True)
    s2_s2 = torch.sum(t2 * t2, -1, keepdim=True)
    s_target = s1_s2 / (s2_s2 + eps) * t2
    e_noise = t1 - s_target
    tn = torch.sum(s_target * s_target, -1, keepdim=True)
    nn_ = torch.sum(e_noise * e_noise, -1, keepdim=True)
    return torch.mean(10 * torch.log10(tn / (nn_ + eps) + eps)).item()


def test_si_snr_matches_reference(rng):
    s1 = rng.standard_normal((4, 1, 16000)).astype(np.float32)
    s2 = (s1 + 0.3 * rng.standard_normal((4, 1, 16000))).astype(np.float32)
    ours = float(losses.si_snr(jnp.asarray(s1), jnp.asarray(s2)))
    assert abs(ours - _ref_si_snr(s1, s2)) < 1e-3
    assert abs(float(losses.loss_sisdr(jnp.asarray(s1), jnp.asarray(s2))) + ours) < 1e-6


def test_mse_l1_match_torch(rng):
    a = rng.standard_normal((3, 5, 7)).astype(np.float32)
    b = rng.standard_normal((3, 5, 7)).astype(np.float32)
    assert abs(float(losses.mse_loss(jnp.asarray(a), jnp.asarray(b)))
               - torch.nn.functional.mse_loss(torch.from_numpy(a), torch.from_numpy(b)).item()) < 1e-6
    assert abs(float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
               - torch.nn.functional.l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()) < 1e-6


def test_psa_quirk_and_fixed(rng):
    shape = (2, 1, 257, 63, 2)
    enh = rng.standard_normal(shape).astype(np.float32)
    tgt = rng.standard_normal(shape).astype(np.float32)
    mix = rng.standard_normal(shape).astype(np.float32)
    # quirk version matches literal reference math
    eps = 1e-9
    ang_m = np.tanh(mix[..., 1] / (mix[..., 0] + eps))
    ang_t = np.tanh(tgt[..., 1] / (tgt[..., 0] + eps))
    amp_e = np.sqrt(enh[..., 1] ** 2 + enh[..., 0] ** 2)
    amp_t = np.sqrt(tgt[..., 1] ** 2 + tgt[..., 0] ** 2)
    ref = np.mean((amp_e - amp_t * np.cos(ang_t - ang_m)) ** 2)
    ours = float(losses.loss_psa(jnp.asarray(enh), jnp.asarray(tgt), jnp.asarray(mix)))
    assert abs(ours - ref) < 1e-4
    fixed = float(losses.loss_psa_fixed(jnp.asarray(enh), jnp.asarray(tgt), jnp.asarray(mix)))
    assert fixed != pytest.approx(ours)


def test_pit_finds_best_permutation(rng):
    tgt = rng.standard_normal((2, 2, 1, 800)).astype(np.float32)
    enh_swapped = tgt[:, ::-1]  # speakers swapped
    loss, perm = losses.pit_loss(jnp.asarray(enh_swapped), jnp.asarray(tgt), losses.mse_loss)
    assert float(loss) < 1e-10
    assert int(perm) == 1  # permutation (1, 0)
    loss_id, perm_id = losses.pit_loss(jnp.asarray(tgt), jnp.asarray(tgt), losses.mse_loss)
    assert float(loss_id) < 1e-10 and int(perm_id) == 0


def test_pit_gradient_flows(rng):
    tgt = jnp.asarray(rng.standard_normal((1, 2, 400)).astype(np.float32))
    enh = jnp.asarray(rng.standard_normal((1, 2, 400)).astype(np.float32))

    def f(e):
        loss, _ = losses.pit_loss(e, tgt, losses.mse_loss)
        return loss

    g = jax.grad(f)(enh)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_loss_factory():
    assert losses.get_loss_function("mse") is losses.mse_loss
    assert losses.get_loss_function("si-sdr") is losses.loss_sisdr
    with pytest.raises(ValueError):
        losses.get_loss_function("nope")
