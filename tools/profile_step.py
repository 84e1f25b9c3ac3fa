#!/usr/bin/env python
"""Profile the DCCRN train step on the live TPU and print a per-kernel
cost breakdown (top fusions by total device time).

Usage: python tools/profile_step.py [--steps 5] [--outdir /tmp/dccrn_trace]

Parses the trace.json.gz that jax.profiler emits (the axon tunnel supports
device tracing even though block_until_ready is unreliable — sync by value
fetch, see NOTES_DEV.md).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

# NOTE: do NOT set PYTHONPATH for this script — it breaks the image's axon
# backend registration. Put the repo on sys.path here instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def build_bench_point(batch=128, steps_per_call=16):
    """The EXACT bench.py operating point: bf16 DCCRN, remat named-saves
    conv_out,cbn_stats, folded CBN, int16-wire inputs, scan-16 dispatch.

    Returns (fn, args, n_steps_per_dispatch) where fn(*args) -> (state,
    losses); per-op times from a trace divide by steps*steps_per_call.
    """
    import optax

    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    model = DCCRN(dtype="bfloat16", remat=True,
                  remat_policy="conv_out,cbn_stats", cbn_fold=True)
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

    def step_fn(state, rng, mixture, target):
        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                mixture, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return mse_loss(out, target), mutated.get("batch_stats", {})

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return ({"params": new_params, "batch_stats": new_stats,
                 "opt_state": new_opt}, loss)

    def enc(x):
        scale = jnp.max(jnp.abs(x)) / 32767.0 + 1e-12
        return {"q": jnp.round(x / scale).astype(jnp.int16),
                "scale": jnp.full((x.shape[0],), scale, jnp.float32)}

    def dec(x):
        return x["q"].astype(jnp.float32) * x["scale"]

    mixtures = enc(jnp.stack([mixture] * steps_per_call))
    targets = enc(jnp.stack([target] * steps_per_call))

    @jax.jit
    def train_scan(state, rng, mixtures, targets):
        def body(carry, batch):
            st, rng_key = carry
            rng_key, sub = jax.random.split(rng_key)
            st, loss = step_fn(st, sub, dec(batch[0]), dec(batch[1]))
            return (st, rng_key), loss

        (state, _), losses = jax.lax.scan(body, (state, rng),
                                          (mixtures, targets))
        return state, losses

    return train_scan, state, mixtures, targets, steps_per_call


def build_step(remat=False, save=False, fold=False, fused=False,
               model_name="dccrn", batch=16):
    from speech_enhancement_tpu.train.losses import mse_loss

    if model_name == "sepformer":
        from speech_enhancement_tpu.models.sepformer import Sepformer

        model = Sepformer(dtype="bfloat16", remat=remat,
                          fused_attention=fused,
                          encoder_in_nchannels=1, masknet_numspks=1)
    else:
        from speech_enhancement_tpu.models.dccrn import DCCRN

        model = DCCRN(dtype="bfloat16", remat=remat,
                      remat_policy="conv_out,cbn_stats" if save else "",
                      cbn_fold=fold, use_fused_blocks=fused)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mixture = jax.random.normal(k1, (batch, 1, 64000)) * 0.1
    target = jax.random.normal(k2, (batch, 1, 64000)) * 0.1
    if model_name == "sepformer":  # multi-speaker wav contract [B, S, C, T]
        target = target[:, None]
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

    return train_step, state, mixture, target


def categorize(name: str) -> str:
    if name.startswith("fusion") or ".fusion" in name:
        return "fusion(elementwise)"
    if "custom-call" in name or "tpu_custom_call" in name:
        return "pallas"
    for key in ("conv", "scan", "reduce", "dot", "transpose", "copy", "dynamic"):
        if key in name:
            return key
    return "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--outdir", default="/tmp/dccrn_trace")
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--fold", action="store_true")
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--model", default="dccrn", choices=["dccrn", "sepformer"])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--bench-point", action="store_true",
                        help="profile the exact bench.py operating point "
                             "(batch 128, scan-16, int16 wire, remat+fold)")
    args = parser.parse_args()

    steps_per_dispatch = 1
    if args.bench_point:
        batch = args.batch if args.batch != 16 else 128
        train_step, state, mixture, target, steps_per_dispatch = (
            build_bench_point(batch=batch))
    else:
        train_step, state, mixture, target = build_step(
            remat=args.remat, save=args.save, fold=args.fold,
            fused=args.fused, model_name=args.model, batch=args.batch)
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, loss = train_step(state, rng, mixture, target)
        float(jnp.ravel(loss)[-1])

    jax.profiler.start_trace(args.outdir)
    for _ in range(args.steps):
        state, loss = train_step(state, rng, mixture, target)
        float(jnp.ravel(loss)[-1])
    jax.profiler.stop_trace()
    args.steps *= steps_per_dispatch  # per-op tables divide by true steps

    paths = sorted(glob.glob(os.path.join(args.outdir, "plugins/profile/*/*.trace.json.gz")))
    path = paths[-1]
    data = json.loads(gzip.open(path).read())
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # keep only TPU device-thread events (they carry HLO names)
    by_name = collections.defaultdict(float)
    pids = {}
    for item in data.get("traceEvents", []):
        if item.get("ph") == "M" and item.get("name") == "process_name":
            pids[item["pid"]] = item["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    for e in events:
        if device_pids and e.get("pid") not in device_pids:
            continue
        by_name[e["name"]] += e.get("dur", 0)

    total = sum(by_name.values())
    print(f"trace: {path}")
    print(f"total device-event time: {total/1000/args.steps:.2f} ms/step over {args.steps} steps")
    cats = collections.defaultdict(float)
    for name, dur in by_name.items():
        cats[categorize(name)] += dur
    print("\n== by category (ms/step) ==")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {dur/1000/args.steps:8.2f}")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur/1000/args.steps:8.3f}  {name[:140]}")


if __name__ == "__main__":
    main()
