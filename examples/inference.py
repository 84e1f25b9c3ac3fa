#!/usr/bin/env python
"""Manual inference walkthrough (the reference ships this as
inference.ipynb — load a run, enhance one file, inspect metrics).

Usage:
  python examples/inference.py --run-dir result/dnn/20260816-.../ \
      --wav noisy.wav --out enhanced.wav
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor SE_TPU_PLATFORM even where sitecustomize force-registers a TPU
# plugin and overrides JAX_PLATFORMS (this image's axon relay)
if os.environ.get("SE_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SE_TPU_PLATFORM"])


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run-dir", required=True, help="training run directory")
    parser.add_argument("--wav", required=True, help="input (noisy) wav")
    parser.add_argument("--out", default="enhanced.wav")
    parser.add_argument("--clean", default=None, help="optional clean wav for scoring")
    args = parser.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.data.wav_io import read_wav, write_wav
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.train import checkpoints as ckpt
    from speech_enhancement_tpu.train.evaluate import evaluate_utterance
    from speech_enhancement_tpu.train.metrics import compute_metrics

    config = load_config(os.path.join(args.run_dir, "config.yaml"))
    model, spec = build_model(config.model)

    wav, sr = read_wav(args.wav)
    assert sr == int(config.dset.sample_rate), f"expected {config.dset.sample_rate} Hz"
    mixture = jnp.asarray(wav)[None]  # [1, C, T]

    # init a template then restore the checkpoint into it
    import jax

    variables = model.init(jax.random.PRNGKey(0), *_example_input(spec, config, mixture))
    path = ckpt.latest_checkpoint(args.run_dir)
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": {}}
    restored = ckpt.load_checkpoint(path, {"params": template["params"]})
    apply_vars = {"params": restored["params"]}
    if variables.get("batch_stats"):
        apply_vars["batch_stats"] = variables["batch_stats"]

    apply_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    enhanced = evaluate_utterance(mixture, apply_fn, apply_vars, spec, config)
    if spec.multi_speaker:
        enhanced = enhanced[:, 0]
    enhanced_np = np.asarray(enhanced)[0]
    write_wav(args.out, enhanced_np, sr)
    print(f"wrote {args.out} ({enhanced_np.shape[-1] / sr:.2f} s)")

    if args.clean:
        clean, _ = read_wav(args.clean)
        scores = compute_metrics(clean[None], enhanced_np[None], sr, ("sisdr", "stoi"))
        print("scores vs clean:", scores)


def _example_input(spec, config, mixture):
    from speech_enhancement_tpu.ops.stft import stft_custom

    window = int(config.dset.sample_rate * config.model.segment)
    example = mixture[..., :window]
    if example.shape[-1] < window:
        import jax.numpy as jnp

        example = jnp.pad(example, ((0, 0), (0, 0), (0, window - example.shape[-1])))
    if spec.domain == "stft":
        example = stft_custom(example, config.model)
    return (example,)


if __name__ == "__main__":
    run()
