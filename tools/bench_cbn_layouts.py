#!/usr/bin/env python
"""Isolate ComplexBatchNorm fwd+bwd cost on TPU across activation layouts.

Theory being tested: elementwise fusions over channels-minor activations
waste VPU lanes when C << 128 (enc0 has C=8/part). If the time-minor
layout is much faster in isolation, layout surgery in DCCRN is worth it;
if not, the CBN chain is latency/overhead-bound, not lane-bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from speech_enhancement_tpu.ops.complex_ops import ComplexBatchNorm

REPS = 30


def bench(shape, channel_axis, dtype, label):
    mod = ComplexBatchNorm(channel_axis=channel_axis)
    key = jax.random.PRNGKey(0)
    xr = jax.random.normal(key, shape, dtype)
    xi = jax.random.normal(key, shape, dtype) * 0.5
    variables = mod.init(jax.random.PRNGKey(1), (xr, xi))

    @jax.jit
    def loop(params, xr, xi):
        def body(carry, _):
            def loss(p):
                (zr, zi), _ = mod.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    (xr + carry.astype(xr.dtype), xi),
                    use_running_average=False, mutable=["batch_stats"],
                )
                return jnp.sum(zr * zr + zi * zi).astype(jnp.float32)

            val, grads = jax.value_and_grad(loss)(params)
            return carry + val * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=REPS)
        return out

    out = loop(variables["params"], xr, xi)
    float(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(loop(variables["params"], xr, xi))
        best = min(best, time.perf_counter() - t0)
    per_op = best / REPS * 1000
    elems = 2 * int(jnp.prod(jnp.array(shape)))
    print(f"{label:34s} {per_op:7.3f} ms  ({elems/1e6:.1f}M elem/part-pair)",
          flush=True)


if __name__ == "__main__":
    B, F, T, C = 16, 128, 644, 16
    for dtype in (jnp.bfloat16, jnp.float32):
        name = "bf16" if dtype == jnp.bfloat16 else "f32"
        bench((B, F, T, C), -1, dtype, f"enc0 NHWC C-minor {name}")
        bench((B, C, F, T), 1, dtype, f"enc0 NCHW T-minor {name}")
        bench((B, F, C, T), 2, dtype, f"enc0 NFCT T-minor {name}")
