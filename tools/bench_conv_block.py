#!/usr/bin/env python
"""Per-block TPU timing: fused Pallas conv blocks vs the XLA composition.

Runs every DCCRN encoder/decoder block shape (batch 16, 4 s @ 16 kHz ->
T = 647 frames) through (a) the fused Pallas kernel and (b) the exact XLA
ops it replaces (pointwise apply -> NHWC conv/conv_transpose), and prints
per-block forward times. This decides whether the fused path replaces the
XLA forward in models/dccrn.py (use_fused_blocks).

Usage: python tools/bench_conv_block.py [--batch 16] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

T_FRAMES = 647  # 4 s @ 16 kHz, win 400 / hop 100, both-sides pad

# (f_in, c2in, c2out) for encoder; decoder uses (f_in, c2x, c2s, c2out)
ENC_SHAPES = [
    (256, 2, 16), (128, 16, 32), (64, 32, 64), (32, 64, 128),
    (16, 128, 256), (8, 256, 256),
]
DEC_SHAPES = [
    (4, 256, 256, 256), (8, 256, 256, 128), (16, 128, 128, 64),
    (32, 64, 64, 32), (64, 32, 32, 16), (128, 16, 16, 2),
]


def _sync(x):
    return float(jnp.ravel(x)[0])  # forced fetch (axon relay)


def _time(fn, *args, reps=10):
    out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out if not isinstance(out, tuple) else out[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stats", action="store_true",
                    help="emit training-mode CBN stat partials too")
    args = ap.parse_args()
    from speech_enhancement_tpu.models.dccrn import _block_complex_kernel
    from speech_enhancement_tpu.ops.pallas.experimental import conv_block as cb

    dtype = jnp.dtype(args.dtype)
    batch, t = args.batch, T_FRAMES
    key = jax.random.PRNGKey(0)
    total_pallas, total_xla = 0.0, 0.0

    print(f"# batch={batch} T={t} dtype={args.dtype} stats={args.stats}")
    for f_in, c2in, c2out in ENC_SHAPES:
        x = (jax.random.normal(key, (batch, f_in * c2in, t)) * 0.3).astype(dtype)
        wr = jax.random.normal(key, (5, 2, c2in // 2, c2out // 2)) * 0.1
        wi = jax.random.normal(key, (5, 2, c2in // 2, c2out // 2)) * 0.1
        w2 = _block_complex_kernel(wr, wi)
        b2 = jnp.zeros((c2out,))
        coeffs = cb.identity_coeffs(c2in)

        def pallas_fn(x, w2=w2, b2=b2, coeffs=coeffs, f_in=f_in, c2in=c2in,
                      c2out=c2out):
            return cb.fused_conv_block(
                x, w2, b2, *coeffs, 0.25, f_in=f_in, c2in=c2in, c2out=c2out,
                with_stats=args.stats)

        @jax.jit
        def xla_fn(x, w2=w2, b2=b2, coeffs=coeffs, f_in=f_in, c2in=c2in,
                   c2out=c2out):
            xb = x.reshape(batch, f_in, c2in, t)
            z = cb._pointwise_ref(xb, *coeffs, 0.25)
            znhwc = jnp.transpose(z, (0, 1, 3, 2)).astype(dtype)
            y = jax.lax.conv_general_dilated(
                znhwc, w2.astype(dtype), (2, 1), ((2, 2), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b2.astype(dtype)
            return jnp.transpose(y, (0, 1, 3, 2))

        ms_p = _time(pallas_fn, x)
        ms_x = _time(xla_fn, x)
        total_pallas += ms_p
        total_xla += ms_x
        print(f"enc f{f_in:4d} c{c2in:4d}->{c2out:4d}: "
              f"pallas {ms_p:7.3f} ms   xla {ms_x:7.3f} ms   "
              f"x{ms_x / ms_p:5.2f}")

    for f_in, c2x, c2s, c2out in DEC_SHAPES:
        x = (jax.random.normal(key, (batch, f_in * c2x, t)) * 0.3).astype(dtype)
        s = (jax.random.normal(key, (batch, f_in * c2s, t)) * 0.3).astype(dtype)
        c2j = c2x + c2s
        wr = jax.random.normal(key, (5, 2, c2j // 2, c2out // 2)) * 0.1
        wi = jax.random.normal(key, (5, 2, c2j // 2, c2out // 2)) * 0.1
        w2 = _block_complex_kernel(wr, wi)
        b2 = jnp.zeros((c2out,))
        cfx = cb.identity_coeffs(c2x)
        cfs = cb.identity_coeffs(c2s)

        def pallas_fn(x, s, w2=w2, b2=b2, cfx=cfx, cfs=cfs, f_in=f_in,
                      c2x=c2x, c2s=c2s, c2out=c2out):
            return cb.fused_deconv_block(
                x, s, w2, b2, cfx, 0.25, cfs, 0.25, f_in=f_in, c2x=c2x,
                c2s=c2s, c2out=c2out, with_stats=args.stats)

        @jax.jit
        def xla_fn(x, s, w2=w2, b2=b2, cfx=cfx, cfs=cfs, f_in=f_in,
                   c2x=c2x, c2s=c2s, c2out=c2out):
            xb = x.reshape(batch, f_in, c2x, t)
            sb = s.reshape(batch, f_in, c2s, t)
            zx = cb._pointwise_ref(xb, *cfx, 0.25)
            zs = cb._pointwise_ref(sb, *cfs, 0.25)
            cxh, csh = c2x // 2, c2s // 2
            joined = jnp.concatenate(
                [zx[:, :, :cxh], zs[:, :, :csh], zx[:, :, cxh:],
                 zs[:, :, csh:]], axis=2)
            jn = jnp.transpose(joined, (0, 1, 3, 2)).astype(dtype)
            y = jax.lax.conv_transpose(
                jn, w2.astype(dtype), (2, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, 2:-1, 1:, :] + b2.astype(dtype)
            return jnp.transpose(y, (0, 1, 3, 2))

        ms_p = _time(pallas_fn, x, s)
        ms_x = _time(xla_fn, x, s)
        total_pallas += ms_p
        total_xla += ms_x
        print(f"dec f{f_in:4d} c{c2x}+{c2s}->{c2out:4d}: "
              f"pallas {ms_p:7.3f} ms   xla {ms_x:7.3f} ms   "
              f"x{ms_x / ms_p:5.2f}")

    print(f"# total forward blocks: pallas {total_pallas:.2f} ms "
          f"vs xla {total_xla:.2f} ms ({total_xla / total_pallas:.2f}x)")
    print(f"# device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
