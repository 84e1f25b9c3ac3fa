#!/usr/bin/env python
"""Benchmark: DCCRN training-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N}

Metric definition (BASELINE.md north star): utterances/sec/chip for a full
DCCRN train step (forward + backward + Adam update + grad clip) on
4 s @ 16 kHz utterances, reference-default model config (~9.4 MB,
kernel_num [16,32,64,128,256,256]).

Configuration benched = the framework's TPU fast path:
  * bf16 compute (f32 params/accumulations),
  * NO remat (round 5): the r4 per-op trace showed the batch-128 step is
    elementwise-HBM-traffic bound (53% of device time in ~1.3 ms fusions;
    convs are 8%), so the remat recompute's EXTRA elementwise passes cost
    more than the saved residuals buy — and since the r4 split-weight
    skip join freed the decoder concat temps, the no-remat step fits the
    16 GB HBM at batch 128 again. Measured (tools/bench_batch_sweep.py,
    int16 wire): no-remat batch 64/96/112/120/128 -> 378.6/439.7/496.8/
    504.3/588.5 utt/s/chip vs the r4 remat knee's 491.7; batch 136
    no-remat did not complete compile+dispatch in 22 min (frontier).
    Remat remains a model flag for memory-tight configs,
  * stacked [.., 2C] activations between complex blocks (no per-block
    slice/concat copy pairs),
  * solver.steps_per_call=16 — 16 optimizer steps per device dispatch via
    lax.scan (the Solver feature; amortizes the ~30 ms axon relay dispatch
    overhead). Measured ladder: 76.3 (r1 fast path) -> 74.9 (stacked)
    -> 72.8 (scan16) -> 67.8 (named saves) -> 65.4 ms/step (folded CBN)
    at batch 16 on v5e,
  * batch 128 — the sweep knee (tools/bench_batch_sweep.py) and
    lane-aligned (128 no-remat is FASTER per step than 120: 217.5 vs
    238.0 ms). Per-chip throughput is the BASELINE.md metric, so the
    headline operating point is the sweep winner, not batch 16,
  * int16 wire scan inputs (dset.wire: int16) — resident input stacks
    quarter; decode is one fused multiply inside the step.
Throughput is total utterances / total wall time; each dispatch is synced
by fetching the loss (block_until_ready lies under the axon relay).

vs_baseline: ratio against the measured reference implementation
(ooshyun/Speech-Enhancement-Pytorch DCCRN, torch CPU — the only hardware
both frameworks share in this image; see BASELINE_MEASURED.json). The
reference publishes no GPU numbers (BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BATCH = 128
SECONDS = 4
SR = 16000
STEPS_PER_CALL = 16
WARMUP_DISPATCHES = 2
TIMED_DISPATCHES = 6
V5E_BF16_PEAK_FLOPS = 197e12


def main():
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    model = DCCRN(dtype="bfloat16", remat=False, cbn_fold=True)
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

    def step_fn(state, rng, mixture, target):
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

    # int16 wire inputs, the production loader path (dset.wire: int16,
    # Solver._decode_wire): resident scan inputs quarter, decode is one
    # fused multiply inside the step
    def enc(x):
        scale = jnp.max(jnp.abs(x)) / 32767.0 + 1e-12
        return {"q": jnp.round(x / scale).astype(jnp.int16),
                "scale": jnp.full((x.shape[0],), scale, jnp.float32)}

    def dec(x):
        return x["q"].astype(jnp.float32) * x["scale"]

    mixtures = enc(jnp.stack([mixture] * STEPS_PER_CALL))
    targets = enc(jnp.stack([target] * STEPS_PER_CALL))

    @jax.jit
    def train_scan(state, rng, mixtures, targets):
        def body(carry, batch):
            st, rng_key = carry
            rng_key, sub = jax.random.split(rng_key)
            st, loss = step_fn(st, sub, dec(batch[0]), dec(batch[1]))
            return (st, rng_key), loss

        (state, _), losses = jax.lax.scan(body, (state, rng), (mixtures, targets))
        return state, losses

    # XLA-counted FLOPs per dispatch, for the MFU estimate
    flops_per_dispatch = None
    try:
        lowered = train_scan.lower(state, jax.random.PRNGKey(1), mixtures, targets)
        flops_per_dispatch = lowered.compile().cost_analysis()["flops"]
    except Exception:
        pass

    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP_DISPATCHES):
        state, losses = train_scan(state, rng, mixtures, targets)
        last_loss = float(jnp.ravel(losses)[-1])  # forced sync (NOTES_DEV.md)

    times = []
    for _ in range(TIMED_DISPATCHES):
        t0 = time.perf_counter()
        state, losses = train_scan(state, rng, mixtures, targets)
        last_loss = float(jnp.ravel(losses)[-1])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2] / STEPS_PER_CALL  # median, per optimizer step

    assert last_loss == last_loss, "non-finite loss in benchmark run"

    utt_per_sec = BATCH / dt
    rtf = utt_per_sec * SECONDS  # seconds of audio per wall second
    mfu = None
    if flops_per_dispatch:
        mfu = (flops_per_dispatch / STEPS_PER_CALL) / dt / V5E_BF16_PEAK_FLOPS

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
        "unit": "utterances/sec/chip (4s@16kHz, batch 128, fwd+bwd+adam)",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {"step_seconds": round(dt, 4), "real_time_factor": round(rtf, 1),
                  "steps_per_call": STEPS_PER_CALL,
                  "mfu_estimate": round(mfu, 4) if mfu else None,
                  "device": str(jax.devices()[0])},
    }))


def _run_with_retries() -> int:
    """Re-exec the bench in child processes, retrying on axon-relay flaps.

    The single-chip tunnel intermittently refuses claims with
    'UNAVAILABLE: TPU backend setup/compile error' (a failed claim-wait
    takes ~25 min); a failed backend init is cached process-wide in JAX,
    so each retry needs a fresh process. Stdout (the one JSON line) passes
    straight through; diagnostics go to stderr.
    """
    import subprocess
    import sys

    attempts = int(os.environ.get("SE_BENCH_ATTEMPTS", "3"))
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run"])
        if proc.returncode == 0:
            return 0
        print(f"bench attempt {attempt + 1}/{attempts} failed "
              f"(rc={proc.returncode}); retrying", file=sys.stderr, flush=True)
        time.sleep(120)
    return 1


if __name__ == "__main__":
    import sys

    if "--run" in sys.argv:
        main()
    else:
        sys.exit(_run_with_retries())
