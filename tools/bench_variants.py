#!/usr/bin/env python
"""Time DCCRN train-step variants on the live TPU.

Usage: python tools/bench_variants.py base fold remat fold+remat ...
Variant grammar: '+'-joined flags out of {base, fold, remat, save, f32,
nchw, fusedblk, scanN, batchN} — e.g. 'fusedblk+fold+remat+save+scan4+batch128'.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def run_variant(name: str) -> float:
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    flags = set(name.split("+"))
    batch = 16
    for f in flags:
        if f.startswith("batch"):
            batch = int(f[5:])
    model = DCCRN(
        dtype="float32" if "f32" in flags else "bfloat16",
        cbn_fold="fold" in flags,
        remat="remat" in flags,
        layout="nchw" if "nchw" in flags else "nhwc",
        remat_policy="conv_out,cbn_stats" if "save" in flags else "",
        use_fused_blocks="fusedblk" in flags,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mixture = jax.random.normal(k1, (batch, 1, 64000)) * 0.1
    target = jax.random.normal(k2, (batch, 1, 64000)) * 0.1
    variables = model.init(k3, mixture)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
    }

    @jax.jit
    def train_step(state, rng, mixture, target):
        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                mixture, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return mse_loss(out, target), mutated.get("batch_stats", {})

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"]
        )
        updates, new_opt = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return (
            {"params": new_params, "batch_stats": new_stats, "opt_state": new_opt},
            loss,
        )

    n_scan = 1
    for f in flags:
        if f.startswith("scan"):
            n_scan = int(f[4:])
    if n_scan > 1:
        # N steps per dispatch (Solver steps_per_call): amortizes the ~30 ms
        # relay dispatch overhead. Same math as N single steps.
        mixtures = jnp.stack([mixture] * n_scan)
        targets = jnp.stack([target] * n_scan)

        @jax.jit
        def train_scan(state, rng, mixtures, targets):
            def body(carry, batch):
                st, key = carry
                key, sub = jax.random.split(key)
                st, loss = train_step_core(st, sub, batch[0], batch[1])
                return (st, key), loss

            (state, _), losses = jax.lax.scan(body, (state, rng), (mixtures, targets))
            return state, losses

        train_step_core = train_step.__wrapped__  # uncompiled core fn
        dispatch = lambda st, rng: train_scan(st, rng, mixtures, targets)  # noqa: E731
    else:
        dispatch = lambda st, rng: train_step(st, rng, mixture, target)  # noqa: E731

    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, loss = dispatch(state, rng)
        lv = float(jnp.ravel(loss)[-1])
    times = []
    for it in range(10):
        t0 = time.perf_counter()
        state, loss = dispatch(state, rng)
        lv = float(jnp.ravel(loss)[-1])
        times.append(time.perf_counter() - t0)
        if n_scan > 1 and not bool(jnp.all(jnp.isfinite(loss))):
            print(f"  non-finite at dispatch {it}: {loss}", flush=True)
    times.sort()
    dt = times[len(times) // 2] / n_scan
    print(f"{name:24s} {dt*1000:8.1f} ms/step  {batch/dt:7.1f} utt/s  loss={lv:.5f}",
          flush=True)
    return dt


if __name__ == "__main__":
    for variant in sys.argv[1:] or ["base"]:
        run_variant(variant)
