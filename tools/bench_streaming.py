#!/usr/bin/env python
"""Streaming-serving benchmark for DCCRNStreamer on the live TPU.

Two serving numbers:

1. **Per-chunk step latency** at batch 1: wall time of one compiled
   ``step()`` (consume a 100 ms chunk, emit 100 ms enhanced). A stream is
   real-time iff this is < the chunk duration; the margin is the serving
   headroom. Note the axon relay adds ~30 ms dispatch overhead per call
   (docs/ARCHITECTURE.md "Known environment quirks") — on a local chip the
   step wall is the device time alone, so the relay number is an upper
   bound.
2. **Concurrent real-time streams per chip**: batch B runs B independent
   streams in one step (all stream state is leading-batch). Sweep B and
   report the largest B whose per-step wall stays under the chunk
   duration, i.e. how many live callers one chip serves in real time.

Usage: python tools/bench_streaming.py [--chunk-frames 16] [--reps 50]
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
except Exception:
    pass

SR = 16000


def time_steps(streamer, batch, reps):
    """Median per-step wall (s) over ``reps`` steps of one stream state."""
    state = streamer.init_state(batch)
    key = jax.random.PRNGKey(0)
    chunk = jax.random.normal(key, (batch, streamer.chunk_samples)) * 0.1
    # warmup: compile + first dispatch (two steps: CRNStreamer's priming
    # first-step and the steady step are separate compiled programs)
    for _ in range(2):
        state, out = streamer.step(state, chunk)
        float(jnp.sum(out))  # true sync through the relay
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, out = streamer.step(state, chunk)
        float(jnp.sum(out))
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def build_streamer(model_name: str, chunk_frames: int):
    if model_name == "crn":
        from speech_enhancement_tpu.config import Config
        from speech_enhancement_tpu.models.crn import CRN
        from speech_enhancement_tpu.ops.stft import stft_custom
        from speech_enhancement_tpu.serve import CRNStreamer

        model = CRN(dtype="bfloat16")
        cfg = Config({"n_fft": 512, "hop_length": 128, "win_length": 512,
                      "center": True})
        wav = jax.random.normal(jax.random.PRNGKey(1), (1, 1, SR)) * 0.1
        variables = model.init(jax.random.PRNGKey(2),
                               stft_custom(wav, cfg))
        return CRNStreamer(model, variables, chunk_frames=chunk_frames)
    from speech_enhancement_tpu.models.dccrn import DCCRN
    from speech_enhancement_tpu.serve import DCCRNStreamer

    # the flagship serving config: bf16 compute, reference-default sizes
    model = DCCRN(dtype="bfloat16")
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 1, SR)) * 0.1
    variables = model.init(jax.random.PRNGKey(2), wav)
    return DCCRNStreamer(model, variables, chunk_frames=chunk_frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-frames", type=int, default=16)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 8, 32, 64, 128, 256])
    ap.add_argument("--model", default="dccrn", choices=["dccrn", "crn"])
    args = ap.parse_args()

    streamer = build_streamer(args.model, args.chunk_frames)
    chunk_ms = streamer.chunk_samples / SR * 1000.0
    print(f"chunk = {streamer.chunk_samples} samples ({chunk_ms:.1f} ms), "
          f"algorithmic latency = {streamer.latency} samples "
          f"({streamer.latency / SR * 1000:.2f} ms)")

    best_rt = 0
    for batch in args.batches:
        try:
            wall = time_steps(streamer, batch, args.reps)
        except Exception as exc:  # OOM etc — report and stop the sweep
            print(f"batch {batch:4d}: FAILED ({type(exc).__name__})")
            break
        rtf = chunk_ms / (wall * 1000.0)
        ok = wall * 1000.0 < chunk_ms
        if ok:
            best_rt = batch
        print(f"batch {batch:4d}: {wall * 1000.0:8.2f} ms/step  "
              f"rtf {rtf:7.2f}x  {'real-time' if ok else 'OVER'}")
    print(f"concurrent real-time streams per chip: {best_rt}")


if __name__ == "__main__":
    main()
