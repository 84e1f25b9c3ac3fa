#!/usr/bin/env python
"""Train-one-epoch every shipped configs/*.yaml on the REAL TPU at small
batch (the shape class that exposed the batch<=4 XLA miscompile,
NOTES_DEV.md round-2 log), through the full Solver path (train + val).

Prints one line per config: ok/fail + epoch wall time. Serial on purpose —
one CPU core, and parallel remote compiles starve each other.

Usage: python tools/sweep_models_tpu.py [--batch 2] [--only name ...]
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob


def run_one(path, vbd_root, clarity_root, batch):
    from speech_enhancement_tpu.config import load_config
    from speech_enhancement_tpu.main import main
    import tempfile

    cfg = load_config(path)
    is_clarity = str(cfg.dset.name).lower() == "clarity"
    cfg.dset.wav = clarity_root if is_clarity else vbd_root
    cfg.dset.split = [0.5, 0.25, 0.25]
    cfg.dset.segment = 1
    cfg.model.segment = 1
    cfg.solver.root = tempfile.mkdtemp(prefix="sweep_")
    cfg.solver.epochs = 1
    cfg.solver.batch_size = batch
    cfg.solver.all_steps = True
    cfg.solver.validation.total_steps = 2
    cfg.solver.test.total_steps = 1
    cfg.solver.test.num_show = 0

    t0 = time.perf_counter()
    solver = main(cfg, mode="train", return_solver=True)
    dt = time.perf_counter() - t0
    loss = float(solver.scores["train_loss"][0])
    return dt, loss


def main_cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--only", nargs="*", default=None)
    args = parser.parse_args()

    from speech_enhancement_tpu.data.synthetic import (
        make_clarity, make_voicebank_demand,
    )

    vbd_root = make_voicebank_demand("/tmp/sweep_vbd", n_utterances=6,
                                     min_seconds=1.1, max_seconds=1.4)
    clarity_root = make_clarity("/tmp/sweep_clarity", n_scenes=4, seconds=1.2)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for path in sorted(glob.glob(os.path.join(root, "configs", "*.yaml"))):
        name = os.path.basename(path)
        if args.only and not any(o in name for o in args.only):
            continue
        try:
            dt, loss = run_one(path, vbd_root, clarity_root, args.batch)
            line = f"{name:32s} OK   epoch={dt:7.1f}s loss={loss:.5f}"
        except Exception as e:
            first = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            line = f"{name:32s} FAIL {first}"
            traceback.print_exc(limit=3)
        print(line, flush=True)
        results.append(line)

    print("\n== sweep summary ==")
    for line in results:
        print(line)


if __name__ == "__main__":
    main_cli()
