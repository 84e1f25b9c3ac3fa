#!/usr/bin/env python
"""Train-step throughput for non-flagship zoo models on the live TPU.

For each shipped config, builds the MODEL section as shipped (incl. its
bf16 knob where present), runs full train steps (fwd+bwd+clip+Adam) at
batch 16 x 4 s @ 16 kHz, 8 steps per dispatch, and prints ms/step +
utterances/sec/chip. Complements bench.py (DCCRN flagship).

Usage: python tools/bench_zoo_steps.py conv_tasnet_clarity dcunet_vbd ...
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
except Exception:
    pass

BATCH, SECONDS, SR, SCAN = 16, 4, 16000, 8


def bench(config_name: str, batch: int = BATCH, overrides=None):
    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.ops.stft import stft_custom

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", f"{config_name}.yaml"))
    for k, v in (overrides or {}).items():
        setattr(cfg.model, k, v)
    if overrides:
        config_name += "+" + ",".join(f"{k}:{v}" for k, v in overrides.items())
    model, spec = build_model(cfg.model)
    channels = int(cfg.dset.get("audio_channels", 1))
    n_spk = max(1, int(cfg.model.get("num_spk", 1)))

    wav = jax.random.normal(jax.random.PRNGKey(0),
                            (batch, channels, SR * SECONDS)) * 0.1
    target_wav = wav * 0.9
    if spec.domain == "stft":
        inputs = stft_custom(wav, cfg.model)
        target = stft_custom(
            target_wav if spec.monarch
            else jnp.broadcast_to(target_wav[:, None],
                                  (batch, n_spk, channels, SR * SECONDS)),
            cfg.model)
    else:
        inputs = wav
        target = (target_wav if spec.monarch
                  else jnp.broadcast_to(target_wav[:, None],
                                        (batch, n_spk, channels, SR * SECONDS)))

    variables = model.init({"params": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)}, inputs)
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-4))
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {}),
             "opt_state": opt.init(variables["params"])}

    def step(state, rng, inputs, target):
        def loss_of(p):
            vs = {"params": p}
            if state["batch_stats"]:
                vs["batch_stats"] = state["batch_stats"]
            out = model.apply(vs, inputs, train=True,
                              mutable=["batch_stats"] if state["batch_stats"] else [],
                              rngs={"dropout": rng})
            out, mut = out if isinstance(out, tuple) else (out, {})
            t = target
            if hasattr(out, "shape") and out.shape != t.shape:
                t = jnp.broadcast_to(t.reshape(t.shape[0], -1)[:, :1],
                                     out.shape)  # shape-mismatch fallback
            loss = jnp.mean((out - t) ** 2)
            stats = mut.get("batch_stats", state["batch_stats"]) if mut else state["batch_stats"]
            return loss, stats
        (loss, ns), grads = jax.value_and_grad(loss_of, has_aux=True)(state["params"])
        upd, no = opt.update(grads, state["opt_state"], state["params"])
        return ({"params": optax.apply_updates(state["params"], upd),
                 "batch_stats": ns, "opt_state": no}, loss)

    # inputs/target are ARGUMENTS, not closure constants: closed-over
    # arrays embed in the HLO and ship with every remote-compile request —
    # big batches then trip the relay's payload cap (HTTP 413) before any
    # HBM limit is reached
    @jax.jit
    def scan_steps(state, rng, inputs, target):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st, loss = step(st, sub, inputs, target)
            return (st, key), loss
        (state, _), losses = jax.lax.scan(body, (state, rng), None, length=SCAN)
        return state, losses

    # XLA-counted FLOPs -> MFU column (VERDICT r3 task 9: the per-model
    # perf story states utilization, not just utt/s)
    flops_per_step = None
    try:
        analysis = scan_steps.lower(state, jax.random.PRNGKey(3), inputs,
                                    target).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops_per_step = float(analysis["flops"]) / SCAN
    except Exception:
        pass

    rng = jax.random.PRNGKey(3)
    t_compile0 = time.perf_counter()
    state, losses = scan_steps(state, rng, inputs, target)
    float(losses[-1])
    t_compile = time.perf_counter() - t_compile0  # compile + first dispatch wall
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, losses = scan_steps(state, rng, inputs, target)
        float(losses[-1])
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2] / SCAN
    mfu = f"  mfu={flops_per_step / dt / 197e12:.4f}" if flops_per_step else ""
    print(f"{config_name:24s} batch {batch:2d} {dt*1000:8.1f} ms/step  "
          f"{batch/dt:7.1f} utt/s  loss={float(losses[-1]):.5f}  "
          f"compile+first {t_compile:.1f}s{mfu}", flush=True)


if __name__ == "__main__":
    # arg grammar: name[+model_key:value ...][=batch]
    # e.g. crn_vbd+fused_rnn:true=16 benches crn with the Pallas LSTM path.
    for arg in sys.argv[1:] or ["conv_tasnet_clarity", "dcunet_vbd", "crn_vbd"]:
        spec_str, _, b = arg.partition("=")
        name, *kvs = spec_str.split("+")
        overrides = {}
        for kv in kvs:
            k, _, v = kv.partition(":")
            overrides[k] = {"true": True, "false": False}.get(v.lower(), v)
        try:
            bench(name, int(b) if b else BATCH, overrides)
        except Exception as exc:  # one OOM probe must not kill the sweep
            print(f"{spec_str:24s} batch {b or BATCH}  FAILED: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)
