"""Loss functions + permutation-invariant training (device-side, jit-safe).

Reproduces the reference's loss surface (src/loss.py):

* ``l1`` / ``mse``  — plain means (torch F.l1_loss / F.mse_loss defaults);
* ``si_snr`` / ``loss_sisdr`` — the reference's *non-zero-meaned* SI-SNR
  (src/loss.py:14-29; torchmetrics is instantiated with zero_mean=False to
  match, src/solver.py:183);
* ``loss_psa`` — phase-sensitive spectral approximation (Erdogan 2015,
  src/loss.py:32-56) including the reference's ``tanh(imag/real)`` "angle"
  quirk (SURVEY §6b.5); ``loss_psa_fixed`` uses atan2;
* ``pit_loss`` — utterance-level PIT. Unlike the reference's Python loop
  over ``itertools`` with a no-grad pre-pass (src/loss.py:58-100), the
  permutation set is enumerated *statically* at trace time and the minimum
  is taken with ``jnp.min`` — XLA evaluates all S! assignments from one
  [S, S] pairwise loss matrix and the gradient flows only through the
  argmin branch, which is exactly PIT. S <= 4 keeps this trivially cheap.

Note the reference computes PIT and then unconditionally overwrites it with
the plain loss (src/solver.py:469-480, SURVEY §6b.1). The rebuild fixes
this; ``optim.pit_discard_compat: true`` replicates the reference behavior.
"""

from __future__ import annotations

from itertools import permutations
from typing import Callable, Tuple

import jax.numpy as jnp

EPS = 1e-8


def l1_loss(enhanced: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(enhanced - target))


def mse_loss(enhanced: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((enhanced - target) ** 2)


def si_snr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Reference SI-SNR (src/loss.py:21-29): estimate s1 against target s2."""
    s1_s2 = jnp.sum(s1 * s2, axis=-1, keepdims=True)
    s2_s2 = jnp.sum(s2 * s2, axis=-1, keepdims=True)
    s_target = s1_s2 / (s2_s2 + eps) * s2
    e_noise = s1 - s_target
    target_norm = jnp.sum(s_target * s_target, axis=-1, keepdims=True)
    noise_norm = jnp.sum(e_noise * e_noise, axis=-1, keepdims=True)
    snr = 10.0 * jnp.log10(target_norm / (noise_norm + eps) + eps)
    return jnp.mean(snr)


def loss_sisdr(enhanced: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return -si_snr(enhanced, target)


def _psa(enhanced, target, mixture, angle_fn) -> jnp.ndarray:
    amp_enhanced = jnp.sqrt(enhanced[..., 1] ** 2 + enhanced[..., 0] ** 2)
    amp_target = jnp.sqrt(target[..., 1] ** 2 + target[..., 0] ** 2)
    angle_mixture = angle_fn(mixture)
    angle_target = angle_fn(target)
    err = amp_enhanced - amp_target * jnp.cos(angle_target - angle_mixture)
    return jnp.mean(err**2)


def loss_psa(enhanced: jnp.ndarray, target: jnp.ndarray, mixture: jnp.ndarray) -> jnp.ndarray:
    """PSA with the reference's tanh(imag / real) pseudo-angle (src/loss.py:48-49)."""
    return _psa(
        enhanced, target, mixture, lambda x: jnp.tanh(x[..., 1] / (x[..., 0] + 1e-9))
    )


def loss_psa_fixed(enhanced: jnp.ndarray, target: jnp.ndarray, mixture: jnp.ndarray) -> jnp.ndarray:
    """PSA with the true phase (atan2) — the paper's formulation."""
    return _psa(enhanced, target, mixture, lambda x: jnp.arctan2(x[..., 1], x[..., 0]))


def pit_loss(
    enhanced: jnp.ndarray,
    target: jnp.ndarray,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Utterance-level PIT over speaker axis 1 of [B, S, ...] tensors.

    Returns ``(loss, perm_index)`` where ``perm_index`` indexes the statically
    enumerated permutation list (reference: src/loss.py:58-100).
    """
    assert enhanced.shape == target.shape, (enhanced.shape, target.shape)
    n_spk = enhanced.shape[1]
    if n_spk > 4:
        raise ValueError(f"PIT with {n_spk} speakers is factorially expensive; cap is 4")
    pairwise = jnp.stack(
        [
            jnp.stack([loss_fn(enhanced[:, i], target[:, j]) for j in range(n_spk)])
            for i in range(n_spk)
        ]
    )  # [S_enh, S_tgt]
    perms = list(permutations(range(n_spk)))
    perm_losses = jnp.stack(
        [sum(pairwise[perm[j], j] for j in range(n_spk)) / n_spk for perm in perms]
    )
    return jnp.min(perm_losses), jnp.argmin(perm_losses)


def get_loss_function(name: str) -> Callable:
    """Loss factory (reference: src/distrib.py:263-275)."""
    table = {
        "l1": l1_loss,
        "mse": mse_loss,
        "si-sdr": loss_sisdr,
        "sisdr": loss_sisdr,
        "psa": loss_psa,
        "psa-fixed": loss_psa_fixed,
    }
    if name not in table:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(table)}")
    return table[name]
