#!/usr/bin/env python
"""CLI entry point (reference: main.py:1-6, upgraded with real flags).

Usage: python main.py --config configs/dnn_vbd.yaml [--mode train|test] [--save]
"""

import argparse
import faulthandler
import signal

# Failure detection (SURVEY.md §5): `kill -USR1 <pid>` dumps every thread's
# Python stack to stderr without interrupting the run — the one tool that
# diagnoses a wedged remote-TPU dispatch (0% CPU, no log progress).
if hasattr(signal, "SIGUSR1"):
    faulthandler.register(signal.SIGUSR1, all_threads=True, chain=True)


def cli():
    parser = argparse.ArgumentParser(description="speech_enhancement_tpu")
    parser.add_argument("--config", default="configs/dnn_vbd.yaml")
    parser.add_argument("--mode", default="train", choices=["train", "validation", "test"])
    parser.add_argument("--save", action="store_true", help="write enhanced wavs at test")
    parser.add_argument("--dev", action="store_true",
                        help="evaluate on the Clarity dev scenes (reference train.py:20)")
    parser.add_argument("--device", default=None,
                        help="pin the JAX platform (e.g. cpu, tpu); default = auto")
    parser.add_argument("--run-dir", default=None)
    args = parser.parse_args()

    from speech_enhancement_tpu.main import main

    main(args.config, mode=args.mode, save=args.save, dev=args.dev,
         device=args.device, run_dir=args.run_dir)


if __name__ == "__main__":
    cli()
