"""Per-model smoke CLI, the zoo-wide equivalent of the reference's
``__main__`` blocks (every reference model file builds itself on random
input and prints output shape + parameter megabytes, e.g.
src/model/dccrn.py:749-807, demucs.py:503-543, conv_tasnet.py:489-570).

    python -m speech_enhancement_tpu.models dccrn [--config configs/x.yaml]
    python -m speech_enhancement_tpu.models --all

Builds the model (from its shipped config when one exists, else registry
defaults), runs one random-input forward on CPU, and prints the output
shape and parameter size in MB (comparable to README.md:20-83's table).
"""

import argparse
import glob
import os
import sys


def _smoke(name: str, config_path: str | None, seconds: float) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_tpu.config import Config, load_config
    from speech_enhancement_tpu.models import build_model
    from speech_enhancement_tpu.ops.stft import stft_custom

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if config_path is None:
        slug = name.replace("-", "_")
        candidates = glob.glob(os.path.join(root, "configs", f"{slug}_*.yaml"))
        config_path = candidates[0] if candidates else None
    if config_path:
        cfg = load_config(config_path)
        model_cfg = cfg.model
        channels = int(cfg.dset.get("audio_channels", 1))
    else:
        model_cfg = Config({"name": name})
        channels = 1

    model, spec = build_model(model_cfg)
    sr = int(model_cfg.get("sample_rate", 16000))
    wav = np.random.default_rng(0).standard_normal(
        (1, channels, int(sr * seconds))).astype(np.float32) * 0.1
    inputs = (stft_custom(jnp.asarray(wav), model_cfg)
              if spec.domain == "stft" else jnp.asarray(wav))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, inputs)
    out = model.apply(variables, inputs, train=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"{name:16s} in {tuple(inputs.shape)} -> out {tuple(out.shape)}  "
          f"params {n_params / 1e6:8.3f}M = {n_params * 4 / 1e6:8.3f} MB  "
          f"domain={spec.domain} monarch={spec.monarch}", flush=True)


def main() -> int:
    parser = argparse.ArgumentParser(
        description="build a zoo model and run a random-input forward")
    parser.add_argument("name", nargs="?", help="registry name (e.g. dccrn)")
    parser.add_argument("--all", action="store_true", help="smoke every model")
    parser.add_argument("--config", default=None, help="explicit config YAML")
    parser.add_argument("--seconds", type=float, default=1.0)
    parser.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                        help="cpu (default — this is a smoke test) or tpu")
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        # never probe the default backend here: on a relay-tunneled TPU
        # host a backend probe blocks on the device claim
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from speech_enhancement_tpu.models import model_names

    names = model_names() if args.all else [args.name]
    if not args.all and args.name is None:
        parser.error("give a model name or --all; options: "
                     + ", ".join(model_names()))
    failed = []
    for name in names:
        try:
            _smoke(name, args.config, args.seconds)
        except Exception as exc:  # keep sweeping on --all
            failed.append(name)
            print(f"{name:16s} FAILED: {type(exc).__name__}: {exc}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
