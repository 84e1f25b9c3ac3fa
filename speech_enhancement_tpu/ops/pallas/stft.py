"""Fused framing + window + rFFT-basis STFT as a Pallas TPU kernel.

The analysis transform X = frames(x) * window @ rfft_basis is the front-end
of every STFT model and of DCCRN's ConvSTFT (models/dccrn.py). XLA's
default lowering materializes the [T', win] frame tensor in HBM between the
gather and the matmul — win/hop (4x for 512/128 and 400/100) more bytes
than the signal itself. This kernel never materializes it:

  * the Hann window is folded into the basis on the host
    (frames * w @ B == frames @ (w[:, None] * B)) — zero runtime cost;
  * the signal is laid out as k = win/hop hop-shifted chunk views
    [B, k, n_frames, hop] (a cheap XLA slice/stack: the raw signal is tiny
    next to the spectrogram output, so the k shifted copies cost ~nothing);
  * per grid step a BlockSpec-indexed VMEM block [k, FRAMES_PER_BLOCK, hop]
    is reassembled in-register into [FRAMES_PER_BLOCK, win] frames and hits
    the MXU against the VMEM-resident basis.

All-VMEM blocks, no manual DMA — the axon TPU runtime faults on
Pallas-issued ``make_async_copy`` (NOTES_DEV.md), so the pipeline is left
to the Pallas grid machinery, which double-buffers block fetches itself.

Wired behind ``DCCRN(use_pallas_stft=True)`` (models/dccrn.py) and
``stft(..., method="pallas")`` (ops/stft.py). Numerical parity with the
matmul path is tested in tests/test_pallas.py (interpret mode hermetically;
compiled on real TPU by tools/bench_pallas_stft.py, which also records the
measured win/loss in NOTES_DEV.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_BLOCK = 128


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _kernel(span_ref, basis_ref, out_ref, *, k):
    """span [1, k, 1, FRAMES_PER_BLOCK, hop] -> out [1, FRAMES_PER_BLOCK, D]."""
    parts = [span_ref[0, shift, 0] for shift in range(k)]  # [FPB, hop] each
    frames = jnp.concatenate(parts, axis=-1)  # [FPB, win]
    out_ref[0] = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("hop", "win", "out_dim", "interpret"))
def _stft_blocks(x_padded, basis_padded, hop, win, out_dim, interpret=False):
    batch, total = x_padded.shape
    k = win // hop
    n_rows = total // hop - (k - 1)  # frame rows available
    n_blocks = n_rows // FRAMES_PER_BLOCK

    # k hop-shifted chunk views: shifted[b, i, f, :] = x[b, (f+i)*hop : ...]
    shifted = jnp.stack(
        [
            x_padded[:, i * hop : (i + n_rows) * hop].reshape(batch, n_rows, hop)
            for i in range(k)
        ],
        axis=1,
    )  # [B, k, n_rows, hop]
    shifted = shifted.reshape(batch, k, n_blocks, FRAMES_PER_BLOCK, hop)

    kernel = functools.partial(_kernel, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, k, 1, FRAMES_PER_BLOCK, hop),
                lambda b, j: (b, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((win, out_dim), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_BLOCK, out_dim),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_blocks * FRAMES_PER_BLOCK, out_dim), jnp.float32
        ),
        interpret=interpret,
    )(shifted, basis_padded)
    return out


def stft_pallas(
    x: jnp.ndarray,
    basis_windowed: np.ndarray,
    hop: int,
    win: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T] x [win, D] -> [B, n_frames, D] with n_frames = (T - win)//hop + 1.

    ``basis_windowed`` is the (window-folded) projection basis; D is padded
    to a lane multiple internally and trimmed on return.
    """
    assert win % hop == 0, "pallas STFT requires hop | win"
    batch, total = x.shape
    n_frames = (total - win) // hop + 1
    k = win // hop

    out_dim = basis_windowed.shape[1]
    out_dim_padded = _round_up(out_dim, 128)
    if out_dim_padded != out_dim:
        # jnp.pad: under the custom-VJP wrapper the basis arrives as a
        # (constant-folded) tracer, which numpy cannot pad
        basis_windowed = jnp.pad(
            jnp.asarray(basis_windowed),
            ((0, 0), (0, out_dim_padded - out_dim)))

    n_frames_padded = _round_up(n_frames, FRAMES_PER_BLOCK)
    needed = (n_frames_padded + k - 1) * hop
    if needed > total:
        x = jnp.pad(x, ((0, 0), (0, needed - total)))
    else:
        x = x[:, :needed]

    out = _stft_blocks(
        x, jnp.asarray(basis_windowed, jnp.float32), hop, win, out_dim_padded,
        interpret=interpret,
    )
    return out[:, :n_frames, :out_dim]


# --------------------------------------------------------------------------
# training: custom VJP (VERDICT r2 item 3)
# --------------------------------------------------------------------------
#
# The analysis transform is linear: out = frames(x) @ basis, so the input
# cotangent is g @ basis^T overlap-added back onto the signal — exactly the
# machinery conv_istft already uses (ops/frame.overlap_add). The backward
# runs in XLA (one MXU matmul + OLA); only the forward needs the fused
# Pallas kernel, because only the forward's frame tensor would otherwise be
# materialized in HBM (win/hop = 4-5x the signal bytes) on every fwd AND
# remat-recompute pass.

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def stft_pallas_diff(x, basis_windowed, hop, win, interpret=False):
    """Differentiable stft_pallas: exact VJP w.r.t. the signal (the basis
    is a config-derived constant; its cotangent is returned as zeros)."""
    return stft_pallas(x, basis_windowed, hop, win, interpret=interpret)


def _stft_diff_fwd(x, basis_windowed, hop, win, interpret):
    out = stft_pallas(x, basis_windowed, hop, win, interpret=interpret)
    return out, (x.shape, basis_windowed)


def _stft_diff_bwd(hop, win, interpret, res, g):
    x_shape, basis = res
    from speech_enhancement_tpu.ops.frame import overlap_add

    basis = jnp.asarray(basis, jnp.float32)
    # d(frames @ B)/dx: frame cotangents g @ B^T, overlap-added at hop
    fct = jnp.matmul(g.astype(jnp.float32), basis.T,
                     preferred_element_type=jnp.float32)
    sig = overlap_add(fct, hop)  # [B, (n_frames-1)*hop + win] <= T always
    total = x_shape[-1]
    cover = sig.shape[-1]
    if cover < total:
        sig = jnp.pad(sig, ((0, 0), (0, total - cover)))
    else:
        sig = sig[:, :total]
    return sig, jnp.zeros(basis.shape, jnp.float32)


stft_pallas_diff.defvjp(_stft_diff_fwd, _stft_diff_bwd)
