"""Fused framing + window + rFFT-basis STFT as a Pallas TPU kernel.

The analysis transform X = frames(x) * window @ rfft_basis is the front-end
of every STFT model and of DCCRN's ConvSTFT (models/dccrn.py). XLA's
default lowering materializes the [T', win] frame tensor in HBM between the
gather and the matmul; this kernel keeps it entirely in VMEM:

  * the Hann window is folded into the basis on the host
    (frames * w @ B == frames @ (w[:, None] * B)) — zero runtime cost;
  * per grid step, one DMA pulls a contiguous signal span from HBM into
    VMEM scratch; the overlapping frame matrix is built in-register from
    ``win / hop`` shifted views (requires hop | win, true for every config:
    512/128, 400/100, 320/160);
  * one MXU matmul against the VMEM-resident basis writes the output block.

Double-buffered: the next block's span DMA is issued before the current
matmul, hiding HBM latency behind the MXU.

Used by the DCCRN front-end and stft_custom when enabled; numerical parity
with ops/stft.py `method="matmul"` is tested in tests/test_pallas.py.
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


def _kernel(x_ref, basis_ref, out_ref, span_ref, sem, *, hop, win, frames_per_block):
    """Grid: (batch, frame_blocks). x (chunked [B, n_chunks, hop]) stays in
    HBM; each block DMAs its overlapping chunk span into VMEM."""
    batch_idx = pl.program_id(0)
    block_idx = pl.program_id(1)
    k = win // hop

    copy = pltpu.make_async_copy(
        x_ref.at[batch_idx, pl.ds(block_idx * frames_per_block, frames_per_block + k - 1), :],
        span_ref,
        sem,
    )
    copy.start()
    copy.wait()

    chunks = span_ref[:]
    # static slices (shift is a Python int) — Mosaic has no dynamic_slice
    parts = [chunks[shift : shift + frames_per_block] for shift in range(k)]
    frames = jnp.concatenate(parts, axis=-1)  # [frames_per_block, win]
    out_ref[0] = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("hop", "win", "out_dim", "interpret")
)
def _stft_blocks(x_padded, basis_padded, hop, win, out_dim, interpret=False):
    batch, total = x_padded.shape
    k = win // hop
    n_blocks = (total // hop - (k - 1)) // FRAMES_PER_BLOCK
    x_padded = x_padded.reshape(batch, total // hop, hop)  # chunk view

    kernel = functools.partial(
        _kernel, hop=hop, win=win, frames_per_block=FRAMES_PER_BLOCK
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # signal stays in HBM
            pl.BlockSpec(
                (win, out_dim), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAMES_PER_BLOCK, out_dim),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, n_blocks * FRAMES_PER_BLOCK, out_dim), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((FRAMES_PER_BLOCK + k - 1, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_padded, basis_padded)
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
        basis_windowed = np.pad(basis_windowed, ((0, 0), (0, out_dim_padded - out_dim)))

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
