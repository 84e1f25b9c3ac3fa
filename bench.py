#!/usr/bin/env python
"""Benchmark: DCCRN training-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N}

Metric definition (BASELINE.md north star): utterances/sec/chip for a full
jitted DCCRN train step (forward + backward + Adam update + grad clip) on
4 s @ 16 kHz utterances, reference-default model config (~9.4 MB,
kernel_num [16,32,64,128,256,256]).

vs_baseline: ratio against the measured reference implementation
(ooshyun/Speech-Enhancement-Pytorch DCCRN, torch CPU — the only hardware
both frameworks share in this image; see BASELINE_MEASURED.json for the
measurement). The reference publishes no GPU numbers (BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

# Persistent compile cache: the axon remote compiler takes minutes on the
# DCCRN program; cache hits make reruns (and the driver's run) fast.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BATCH = 16
SECONDS = 4
SR = 16000
WARMUP = 3
ITERS = 10


def main():
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    # bf16 compute (f32 params + accumulations) — the TPU-native fast path
    model = DCCRN(dtype="bfloat16")
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))

    t_samples = SECONDS * SR
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mixture = jax.random.normal(k1, (BATCH, 1, t_samples)) * 0.1
    target = jax.random.normal(k2, (BATCH, 1, t_samples)) * 0.1

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

    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        state, loss = train_step(state, rng, mixture, target)
        float(loss)  # forced host transfer: the only reliable sync under axon

    # Each timed step syncs by fetching the loss value; block_until_ready
    # returns early under the axon remote backend and under-reports by >100x.
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, loss = train_step(state, rng, mixture, target)
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]  # median

    utt_per_sec = BATCH / dt
    rtf = utt_per_sec * SECONDS  # seconds of audio per wall second

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as handle:
            baseline = json.load(handle)
        ref = baseline.get("utterances_per_second")
        if ref:
            vs_baseline = utt_per_sec / ref

    print(json.dumps({
        "metric": "dccrn_train_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utterances/sec/chip (4s@16kHz, batch 16, fwd+bwd+adam)",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {"step_seconds": round(dt, 4), "real_time_factor": round(rtf, 1),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
