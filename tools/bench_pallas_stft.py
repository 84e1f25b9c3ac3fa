#!/usr/bin/env python
"""Compile + run + bench the Pallas STFT kernel and the Pallas mask kernel
on the real TPU, against their XLA counterparts.

Timings amortize the ~30 ms axon dispatch overhead by looping the op
REPS times inside one jitted scan and syncing on a reduced value.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50


def timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))  # sync
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1000.0  # ms per op


def main():
    from speech_enhancement_tpu.models.dccrn import _stft_bases, conv_stft
    from speech_enhancement_tpu.ops.pallas.masking import apply_mask_e

    key = jax.random.PRNGKey(0)
    wav = jax.random.normal(key, (16, 64000)) * 0.1

    @jax.jit
    def stft_matmul_loop(x):
        def body(carry, _):
            s = conv_stft(x, 400, 100, 512, method="matmul")
            return carry + jnp.sum(s), None
        return jax.lax.scan(body, 0.0, None, length=REPS)[0]

    @jax.jit
    def stft_pallas_loop(x):
        def body(carry, _):
            s = conv_stft(x, 400, 100, 512, method="pallas")
            return carry + jnp.sum(s), None
        return jax.lax.scan(body, 0.0, None, length=REPS)[0]

    ms_mm = timed(stft_matmul_loop, wav)
    ms_pl = timed(stft_pallas_loop, wav)
    print(f"conv_stft matmul: {ms_mm:7.3f} ms   pallas: {ms_pl:7.3f} ms   "
          f"speedup {ms_mm/ms_pl:.2f}x", flush=True)

    # numerical check on-device
    a = conv_stft(wav[:2], 400, 100, 512, method="matmul")
    b = conv_stft(wav[:2], 400, 100, 512, method="pallas")
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max |matmul - pallas| on TPU: {err:.2e}", flush=True)

    # mask kernel: [B, F, T] DCCRN mask-head shapes
    xr, xi, mr, mi = (jax.random.normal(jax.random.PRNGKey(i), (16, 257, 641))
                      for i in range(4))

    def mask_xla(xr, xi, mr, mi):
        mag = jnp.sqrt(mr**2 + mi**2)
        rp = mr / (mag + 1e-8)
        ip = mi / (mag + 1e-8)
        ph = jnp.arctan2(ip, rp)
        s = jnp.sqrt(xr**2 + xi**2 + 1e-8)
        px = jnp.arctan2(xi, xr)
        est = jnp.tanh(mag) * s
        return est * jnp.cos(px + ph), est * jnp.sin(px + ph)

    @jax.jit
    def mask_xla_loop(xr, xi, mr, mi):
        def body(carry, _):
            a, b = mask_xla(xr, xi, mr, mi)
            return carry + jnp.sum(a) + jnp.sum(b), None
        return jax.lax.scan(body, 0.0, None, length=REPS)[0]

    @jax.jit
    def mask_pallas_loop(xr, xi, mr, mi):
        def body(carry, _):
            a, b = apply_mask_e(xr, xi, mr, mi)
            return carry + jnp.sum(a) + jnp.sum(b), None
        return jax.lax.scan(body, 0.0, None, length=REPS)[0]

    ms_x = timed(mask_xla_loop, xr, xi, mr, mi)
    ms_p = timed(mask_pallas_loop, xr, xi, mr, mi)
    print(f"mask_e xla:      {ms_x:7.3f} ms   pallas: {ms_p:7.3f} ms   "
          f"speedup {ms_x/ms_p:.2f}x", flush=True)

    a2 = mask_xla(xr[:1], xi[:1], mr[:1], mi[:1])
    b2 = apply_mask_e(xr[:1], xi[:1], mr[:1], mi[:1])
    err2 = max(float(jnp.max(jnp.abs(a2[0] - b2[0]))),
               float(jnp.max(jnp.abs(a2[1] - b2[1]))))
    print(f"max |xla - pallas| mask: {err2:.2e}", flush=True)


if __name__ == "__main__":
    main()
