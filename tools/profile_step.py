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

# reuse the repo's persistent compile cache (bench.py populates it with the
# exact bench-point program; without this, tracing recompiles everything
# cold through the remote compile service)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def build_bench_point(batch=128, steps_per_call=16):
    """The EXACT bench.py operating point (r5): bf16 DCCRN, NO remat,
    folded CBN, int16-wire inputs, scan-16 dispatch.

    Returns (fn, args, n_steps_per_dispatch) where fn(*args) -> (state,
    losses); per-op times from a trace divide by steps*steps_per_call.
    """
    import optax

    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.losses import mse_loss

    model = DCCRN(dtype="bfloat16", remat=False, cbn_fold=True)  # r5 ship
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mixture = jax.random.normal(k1, (batch, 1, 64000)) * 0.1
    target = jax.random.normal(k2, (batch, 1, 64000)) * 0.1
    variables = jax.jit(model.init)(k3, mixture)  # ONE program, no eager backlog
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
    variables = jax.jit(model.init)(k3, mixture)
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


def build_config_step(config_name: str, batch: int = 16, overrides=None):
    """Generic per-config step builder (same protocol as bench_zoo_steps:
    batch x 4 s @ 16 kHz, fwd+bwd+clip+Adam, shipped MODEL section).
    Lets any zoo family get the per-op trace treatment (unet/wav-unet,
    reference src/model/unet.py:89-146, wav_unet.py:85-105)."""
    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.ops.stft import stft_custom
    from speech_enhancement_tpu.train.losses import mse_loss

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", f"{config_name}.yaml"))
    for k, v in (overrides or {}).items():
        setattr(cfg.model, k, v)
    model, spec = build_model(cfg.model)
    channels = int(cfg.dset.get("audio_channels", 1))
    n_spk = max(1, int(cfg.model.get("num_spk", 1)))
    sr, seconds = 16000, 4

    wav = jax.random.normal(jax.random.PRNGKey(0),
                            (batch, channels, sr * seconds)) * 0.1
    target_wav = wav * 0.9
    if spec.domain == "stft":
        inputs = stft_custom(wav, cfg.model)
        target = stft_custom(
            target_wav if spec.monarch
            else jnp.broadcast_to(target_wav[:, None],
                                  (batch, n_spk, channels, sr * seconds)),
            cfg.model)
    else:
        inputs = wav
        target = (target_wav if spec.monarch
                  else jnp.broadcast_to(target_wav[:, None],
                                        (batch, n_spk, channels, sr * seconds)))

    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(1),
                                    "dropout": jax.random.PRNGKey(2)}, inputs)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {}),
             "opt_state": optimizer.init(variables["params"])}

    @jax.jit
    def train_step(state, rng, inputs, target):
        def loss_of(p):
            vs = {"params": p}
            if state["batch_stats"]:
                vs["batch_stats"] = state["batch_stats"]
            out = model.apply(
                vs, inputs, train=True,
                mutable=["batch_stats"] if state["batch_stats"] else [],
                rngs={"dropout": rng})
            out, mut = out if isinstance(out, tuple) else (out, {})
            t = target
            if hasattr(out, "shape") and out.shape != t.shape:
                t = jnp.broadcast_to(t.reshape(t.shape[0], -1)[:, :1], out.shape)
            stats = (mut.get("batch_stats", state["batch_stats"])
                     if mut else state["batch_stats"])
            return mse_loss(out, t), stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            state["params"])
        return ({"params": optax.apply_updates(state["params"], updates),
                 "batch_stats": new_stats, "opt_state": new_opt}, loss)

    return train_step, state, inputs, target


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas"
    for key in ("conv", "dot", "reduce", "dynamic", "copy", "transpose",
                "pad", "reverse", "rng", "scatter", "select"):
        if key in n:
            return key
    if "fusion" in n:
        return "fusion(elementwise)"
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
    parser.add_argument("--model", default="dccrn",
                        help="dccrn | sepformer | any configs/<name>.yaml "
                             "(generic per-config trace; append "
                             "+key:value model overrides)")
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
    elif args.model not in ("dccrn", "sepformer"):
        name, *kvs = args.model.split("+")
        overrides = {}
        for kv in kvs:
            k, _, v = kv.partition(":")
            overrides[k] = {"true": True, "false": False}.get(v.lower(), v)
        train_step, state, mixture, target = build_config_step(
            name, batch=args.batch, overrides=overrides)
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
    # The device trace has separate named threads: "XLA Modules" (one event
    # per dispatched executable — gives makespan + the true step divisor;
    # the profiler window can clip dispatches, so COUNT them rather than
    # trusting the loop count), "XLA Ops" (leaf HLO ops — the per-op data),
    # and "Steps" (markers). Container events (the jit_* module span and
    # lax.scan/while loop bodies) also appear in "XLA Ops" and must be
    # excluded or every leaf is double-counted.
    pids, tids = {}, {}
    for item in data.get("traceEvents", []):
        if item.get("ph") != "M":
            continue
        if item.get("name") == "process_name":
            pids[item["pid"]] = item["args"].get("name", "")
        if item.get("name") == "thread_name":
            tids[(item["pid"], item.get("tid"))] = item["args"].get("name", "")

    def device_threads(label):
        return {k for k, n in tids.items()
                if n == label and "TPU" in pids.get(k[0], "")}

    ops_threads = device_threads("XLA Ops")
    mod_threads = device_threads("XLA Modules")
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    modules = sorted(
        (e["ts"], e["dur"], e["name"]) for e in events
        if (e["pid"], e.get("tid")) in mod_threads and e.get("dur", 0) > 0)
    # the timed program is the module with the largest TOTAL device time
    # (tiny jit_ravel/fetch modules outnumber it); count its occurrences
    # for the per-step divisor (clipped windows capture fewer than asked)
    mod_time = collections.defaultdict(float)
    mod_names = collections.Counter()
    for _, dur, name in modules:
        mod_time[name] += dur
        mod_names[name] += 1
    main_mod = max(mod_time, key=mod_time.get)
    n_dispatch = mod_names[main_mod]
    n_steps = n_dispatch * steps_per_dispatch
    makespan = sum(d for _, d, n in modules if n == main_mod) / 1000 / n_steps
    gaps = [modules[i + 1][0] - (modules[i][0] + modules[i][1])
            for i in range(len(modules) - 1)
            if modules[i][2] == main_mod and modules[i + 1][2] == main_mod]

    by_name = collections.defaultdict(float)
    container = 0.0
    for e in events:
        if (e["pid"], e.get("tid")) not in ops_threads:
            continue
        name = e["name"]
        if name.startswith(("jit_", "while")) or name.isdigit():
            container += e.get("dur", 0)  # scan/while spans cover their leaves
            continue
        by_name[name] += e.get("dur", 0)

    total = sum(by_name.values())
    print(f"trace: {path}")
    print(f"dispatches captured: {n_dispatch} x {steps_per_dispatch} steps; "
          f"module makespan {makespan:.2f} ms/step"
          + (f"; inter-dispatch gap {sum(gaps)/len(gaps)/1000:.1f} ms"
             if gaps else ""))
    print(f"leaf-op device time: {total/1000/n_steps:.2f} ms/step "
          f"({100 * (total / 1000 / n_steps) / makespan:.1f}% of makespan; "
          f"rest is in-loop scheduling gaps)")
    cats = collections.defaultdict(float)
    for name, dur in by_name.items():
        cats[categorize(name)] += dur
    print("\n== leaf ops by category (ms/step) ==")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {dur/1000/n_steps:8.2f}  ({100*dur/total:5.1f}%)")
    print(f"\n== top {args.top} leaf ops (ms/step) ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {dur/1000/n_steps:8.3f}  {name[:140]}")


if __name__ == "__main__":
    main()
