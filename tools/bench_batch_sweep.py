#!/usr/bin/env python
"""Batch-size sweep + HBM roofline for the DCCRN fast-path train step.

VERDICT r2 items 1-2: (a) the headline metric is utterances/sec/chip, not
utt/s at batch 16 — sweep batch to find the throughput knee; (b) "HBM-bound"
must be arithmetic, not assertion — for every operating point this prints
XLA's own cost analysis (flops, bytes accessed) next to the measured step
time, giving the implied HBM bandwidth to compare against the v5e peak
(~819 GB/s). If implied-GB/s is near peak, the step is at the memory
roofline and further elementwise/copy fusion is the only lever; if far
below, the "floor" claim of round 2 is false and there is schedule headroom.

Usage:  python tools/bench_batch_sweep.py [--batches 16,32,64] [--steps 16]
"""

import argparse
import json
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

SECONDS = 4
SR = 16000
V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_GBPS = 819.0


def build(batch: int, steps_per_call: int, model_kwargs=None,
          wire: str = "f32"):
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    # default = the shipped bench.py operating point (r5: remat OFF — see
    # docs/RESULTS.md §1c); --model-kwargs '{"remat": true, ...}' restores
    # the r2-r4 remat/named-saves point for comparison sweeps
    kwargs = dict(dtype="bfloat16", remat=False, cbn_fold=True)
    kwargs.update(model_kwargs or {})
    model = DCCRN(**kwargs)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))

    t_samples = SECONDS * SR
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    mixture = jax.random.normal(k1, (batch, 1, t_samples)) * 0.1
    target = jax.random.normal(k2, (batch, 1, t_samples)) * 0.1
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
            state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return ({"params": new_params, "batch_stats": new_stats,
                 "opt_state": new_opt}, loss)

    mixtures = jnp.stack([mixture] * steps_per_call)
    targets = jnp.stack([target] * steps_per_call)
    if wire == "int16":
        # the production loader path (dset.wire: int16, data/loader.py
        # encode_wire_int16 -> Solver._decode_wire): resident scan inputs
        # quarter, decode is one fused multiply inside the step
        def enc(x):
            scale = jnp.max(jnp.abs(x)) / 32767.0 + 1e-12
            return {"q": jnp.round(x / scale).astype(jnp.int16),
                    # per-scan-step leading dim so lax.scan can slice it
                    "scale": jnp.full((x.shape[0],), scale, jnp.float32)}
        mixtures, targets = enc(mixtures), enc(targets)

    def dec(x):
        if isinstance(x, dict):
            return x["q"].astype(jnp.float32) * x["scale"]
        return x

    @jax.jit
    def train_scan(state, rng, mixtures, targets):
        def body(carry, batch):
            st, rng_key = carry
            rng_key, sub = jax.random.split(rng_key)
            st, loss = step_fn(st, sub, dec(batch[0]), dec(batch[1]))
            return (st, rng_key), loss

        (state, _), losses = jax.lax.scan(body, (state, rng), (mixtures, targets))
        return state, losses

    return train_scan, state, mixtures, targets


def bench_point(batch: int, steps_per_call: int, warmup=2, timed=6,
                model_kwargs=None, wire="f32"):
    train_scan, state, mixtures, targets = build(batch, steps_per_call,
                                                 model_kwargs, wire=wire)
    cost = {}
    try:
        compiled = train_scan.lower(
            state, jax.random.PRNGKey(1), mixtures, targets).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        cost = {k: analysis[k] for k in ("flops", "bytes accessed")
                if k in analysis}
        # per-space byte buckets when exposed (bytes accessed0{} = operand 0..)
        for key, value in analysis.items():
            if key.startswith("bytes accessed") and key != "bytes accessed":
                cost[key] = value
    except Exception as exc:  # pragma: no cover
        cost["error"] = str(exc)

    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, losses = train_scan(state, rng, mixtures, targets)
        last = float(jnp.ravel(losses)[-1])  # forced sync (axon relay)
    times = []
    for _ in range(timed):
        t0 = time.perf_counter()
        state, losses = train_scan(state, rng, mixtures, targets)
        last = float(jnp.ravel(losses)[-1])
        times.append(time.perf_counter() - t0)
    assert last == last
    times.sort()
    dt = times[len(times) // 2] / steps_per_call

    point = {
        "batch": batch,
        "step_ms": round(dt * 1e3, 2),
        "utt_per_sec": round(batch / dt, 1),
    }
    flops = cost.get("flops")
    nbytes = cost.get("bytes accessed")
    if flops:
        point["mfu"] = round((flops / steps_per_call) / dt / V5E_BF16_PEAK_FLOPS, 4)
        point["tflops_per_step"] = round(flops / steps_per_call / 1e12, 3)
    if nbytes:
        per_step = nbytes / steps_per_call
        point["gb_per_step"] = round(per_step / 1e9, 2)
        point["implied_gbps"] = round(per_step / dt / 1e9, 1)
        point["hbm_roofline_frac"] = round(per_step / dt / 1e9 / V5E_HBM_GBPS, 3)
        point["roofline_ms"] = round(per_step / (V5E_HBM_GBPS * 1e9) * 1e3, 2)
    return point


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--model-kwargs", default="",
                    help='extra DCCRN kwargs as JSON, e.g. {"use_fused_block": true}')
    ap.add_argument("--wire", default="f32", choices=["f32", "int16"],
                    help="scan-input wire format (int16 = the production "
                         "dset.wire path; quarters resident input bytes)")
    args = ap.parse_args()
    extra = json.loads(args.model_kwargs) if args.model_kwargs else None

    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        point = bench_point(batch, args.steps, model_kwargs=extra,
                            wire=args.wire)
        results.append(point)
        print(json.dumps(point), flush=True)
    best = max(results, key=lambda p: p["utt_per_sec"])
    print(json.dumps({"best": best, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
