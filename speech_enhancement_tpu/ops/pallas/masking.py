"""Fused complex-mask application (DCCRN masking mode 'E') as a Pallas kernel.

The mask head of DCCRN/DCUnet (reference dccrn.py:203-221) computes

  est = tanh(|M|) * |X|,  phase = phase(X) + phase(M)

The trig form needs atan2/cos/sin (not available in Mosaic and wasteful on
the VPU); by angle-addition it collapses to a trig-free identity:

  est_r + i est_i = tanh(|M|) / (|M| + eps) * (X * M)     (complex product)

since |X| * cos(phase_x + phase_m) = (xr*mr - xi*mi) / (|M|) etc. One VPU
pass reads 4 [B, F, T] arrays and writes 2 with no HBM intermediates or
transcendentals beyond tanh/rsqrt.

``apply_mask_e`` is the raw kernel (inference); ``apply_mask_e_diff`` wraps
it with a custom VJP whose backward autodiffs the pole-free XLA identity,
so the kernel serves training too — same math within ~1e-6 (the
reference's eps placement differs microscopically). All-VMEM blocks, no
manual DMA (the axon runtime faults on Pallas-issued DMA — see
ops/pallas/stft.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_T = 128


def _kernel(xr_ref, xi_ref, mr_ref, mi_ref, or_ref, oi_ref):
    xr = xr_ref[...]
    xi = xi_ref[...]
    mr = mr_ref[...]
    mi = mi_ref[...]
    mask_mag = jnp.sqrt(mr * mr + mi * mi)
    scale = jnp.tanh(mask_mag) / (mask_mag + 1e-8)
    or_ref[...] = scale * (xr * mr - xi * mi)
    oi_ref[...] = scale * (xr * mi + xi * mr)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_mask_e(xr, xi, mr, mi, interpret: bool = False):
    """Masking mode 'E' over [B, F, T] arrays -> (out_r, out_i)."""
    batch, n_freq, n_time = xr.shape
    pad = (-n_time) % _TILE_T
    if pad:
        pad_cfg = ((0, 0), (0, 0), (0, pad))
        xr, xi, mr, mi = (jnp.pad(a, pad_cfg) for a in (xr, xi, mr, mi))
    tiles = xr.shape[-1] // _TILE_T
    spec = pl.BlockSpec(
        (1, n_freq, _TILE_T), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM
    )
    out_r, out_i = pl.pallas_call(
        _kernel,
        grid=(batch, tiles),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
        ),
        interpret=interpret,
    )(xr, xi, mr, mi)
    return out_r[..., :n_time], out_i[..., :n_time]


# --------------------------------------------------------------------------
# training: custom VJP — forward stays the fused kernel, backward is the
# autodiff of the pole-free XLA identity (models/dccrn.py:644-656). The
# recompute is one elementwise pass, and the gradient matches the XLA
# training branch (the eps'd sqrt keeps it finite at M == 0 where the
# un-eps'd composition has NaN gradients — the round-2 bf16 NaN class).
# --------------------------------------------------------------------------

def _mask_e_ref(xr, xi, mr, mi):
    mag = jnp.sqrt(mr * mr + mi * mi + 1e-12)
    scale = jnp.tanh(mag) / (mag + 1e-8)
    return scale * (xr * mr - xi * mi), scale * (xr * mi + xi * mr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def apply_mask_e_diff(xr, xi, mr, mi, interpret=False):
    return apply_mask_e(xr, xi, mr, mi, interpret=interpret)


def _mask_e_fwd(xr, xi, mr, mi, interpret):
    return (apply_mask_e(xr, xi, mr, mi, interpret=interpret),
            (xr, xi, mr, mi))


def _mask_e_bwd(interpret, res, g):
    _, vjp = jax.vjp(_mask_e_ref, *res)
    return vjp(g)


apply_mask_e_diff.defvjp(_mask_e_fwd, _mask_e_bwd)
