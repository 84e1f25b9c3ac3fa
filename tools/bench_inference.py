#!/usr/bin/env python
"""Inference (enhancement) throughput for DCCRN on the live TPU.

Measures the full eval pipeline (train/evaluate.py: normalize -> sliding
windows -> jitted model -> overlap-discard stitch -> denormalize) on 10 s
utterances, single-utterance batches like Solver.inference, and reports
utterances/sec + real-time factor. Also compares the Pallas inference
kernels (use_pallas_stft / use_pallas_mask) against the XLA path.

Usage: python tools/bench_inference.py
"""

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
except Exception:
    pass

SECONDS = 10
SR = 16000
REPS = 20


def bench(name, **model_kwargs):
    from speech_enhancement_tpu.config import Config
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.train.evaluate import evaluate_utterance
    from speech_enhancement_tpu.models.types import WAV_MONO

    model = DCCRN(**model_kwargs)
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 1, SR * SECONDS)) * 0.1
    variables = model.init(jax.random.PRNGKey(1), wav[..., : SR])

    @jax.jit
    def apply_eval(vs, x):
        return model.apply(vs, x, train=False)

    cfg = Config({
        "model": {"segment": 4, "win_length": 16000},
        "dset": {"sample_rate": SR, "norm": "z-score"},
    })
    import numpy as np

    wav_np = np.asarray(wav)  # evaluate_utterance is numpy-in/numpy-out now
    out = evaluate_utterance(wav_np, apply_eval, variables, WAV_MONO, cfg)
    float(out.sum())  # already fetched (single-executable eval)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = evaluate_utterance(wav_np, apply_eval, variables, WAV_MONO, cfg)
        float(out.sum())
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1000:7.1f} ms/utt ({SECONDS}s audio)  "
          f"{1/dt:6.1f} utt/s  RTF {SECONDS/dt:7.0f}x", flush=True)
    return dt


if __name__ == "__main__":
    bench("xla f32")
    bench("xla bf16", dtype="bfloat16")
    bench("pallas stft+mask bf16", dtype="bfloat16",
          use_pallas_stft=True, use_pallas_mask=True)
