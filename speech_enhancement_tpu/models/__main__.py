"""Per-model smoke CLI (the reference gives every model file an argparse
``__main__`` that builds it, runs a random forward and prints shape + size —
SURVEY §4; e.g. dccrn.py:749-807).

Usage:
  python -m speech_enhancement_tpu.models --name dccrn [--seconds 1.0]
         [--batch 1] [--platform cpu] [--set key=value ...]
"""

from __future__ import annotations

import argparse
import time


def main():
    parser = argparse.ArgumentParser("speech_enhancement_tpu.models")
    parser.add_argument("--name", required=True)
    parser.add_argument("--seconds", type=float, default=1.0)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--channels", type=int, default=None)
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--n-fft", type=int, default=512)
    parser.add_argument("--hop-length", type=int, default=128)
    parser.add_argument("--platform", default=None, help="e.g. cpu to skip the TPU")
    parser.add_argument("--set", nargs="*", default=[],
                        help="extra model config overrides key=value")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from speech_enhancement_tpu.config import Config
    from speech_enhancement_tpu.models import build_model, param_megabytes

    overrides = {}
    for kv in args.set:
        key, _, value = kv.partition("=")
        try:
            import ast

            overrides[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            overrides[key] = value

    cfg = Config(dict({"name": args.name, "n_fft": args.n_fft,
                       "hop_length": args.hop_length,
                       "sample_rate": args.sample_rate}, **overrides))
    model, spec = build_model(cfg)
    channels = args.channels or getattr(model, "audio_channels", 1) or 1

    t_samples = int(args.sample_rate * args.seconds)
    if spec.domain == "stft":
        n_freq = args.n_fft // 2 + 1
        frames = t_samples // args.hop_length + 1
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (args.batch, channels, n_freq, frames, 2)) * 0.1
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, channels, t_samples)) * 0.1

    print(f"In:  {x.shape} ({spec.domain} domain, multi_speaker={spec.multi_speaker})")
    t0 = time.perf_counter()
    variables = model.init({"params": jax.random.PRNGKey(1),
                            "dropout": jax.random.PRNGKey(2)}, x)
    out = model.apply(variables, x, train=False)
    jnp.asarray(out).block_until_ready()
    print(f"Out: {out.shape}  ({time.perf_counter() - t0:.1f}s incl. compile)")
    print(f"model size: {param_megabytes(variables['params']):.3f} MB")


if __name__ == "__main__":
    main()
