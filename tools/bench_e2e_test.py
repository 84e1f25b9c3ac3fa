#!/usr/bin/env python
"""End-to-end ``mode=test`` throughput: the FULL inference pass wall time.

tools/bench_inference.py measures the device pipeline only (13.2 utt/s on
10 s utterances); this tool measures what a user actually waits for in
``python main.py --mode test``: WAV decode + resample, normalization,
windowed device inference, SI-SDR + STOI + PESQ scoring of enhanced AND
mixture, CSV writing — i.e. Solver.inference end to end (reference
solver.py:534-641). The EvalLoader prefetch thread and the scoring thread
pool (train/solver.py) overlap the host work with the device; the gap to
the device-only number is the non-overlapped host remainder.

Usage: python tools/bench_e2e_test.py [--utterances 24] [--seconds 10]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--eval-batch", type=int, default=1,
                    help="solver.test.batch_size: >1 packs windows from "
                         "several utterances into one fixed-shape device "
                         "batch (results bit-identical to batch-1; "
                         "tests/test_eval_batched.py)")
    ap.add_argument("--metrics", default=None,
                    help="comma list to narrow solver.test.metrics (e.g. "
                         "'sisdr' isolates the device pipeline from the "
                         "host STOI/PESQ scoring, the 1-core bottleneck)")
    args = ap.parse_args()

    from speech_enhancement_tpu.config import Config, with_defaults
    from speech_enhancement_tpu.data.synthetic import make_voicebank_demand
    from speech_enhancement_tpu.main import main as run_main

    root = tempfile.mkdtemp(prefix="e2e_vbd_")
    # split 0.05/0.05/0.9: nearly all utterances land in the test split
    make_voicebank_demand(root, n_utterances=args.utterances + 2,
                          min_seconds=args.seconds,
                          max_seconds=args.seconds + 0.01)
    run_root = tempfile.mkdtemp(prefix="e2e_run_")
    cfg = with_defaults(Config({
        "seed": 7,
        "optim": {"optim": "adam", "lr": 3e-4, "loss": "si-sdr", "clip_grad": 5},
        "model": {
            "name": "dccrn", "audio_channels": 1, "num_spk": 1, "segment": 4,
            "sample_rate": 16000, "n_fft": 512, "hop_length": 128,
            "win_length": 512, "rnn_layers": 2, "rnn_units": 128,
            "win_len": 400, "win_inc": 100, "fft_len": 512,
            "masking_mode": "E", "use_clstm": True, "use_cbn": True,
            "kernel_size": 5, "kernel_num": [16, 32, 64, 128, 256, 256],
            "dtype": "bfloat16",
        },
        "dset": {
            "name": "VoiceBankDEMAND", "wav": root,
            "split": [0.05, 0.05, 0.9], "segment": 4, "audio_channels": 1,
            "sample_rate": 16000, "norm": "z-score",
        },
        "solver": {
            "root": run_root, "epochs": 0, "batch_size": 2,
            "test": {"total_steps": 0, "interval": 1, "num_show": 0,
                     "metric": "sisdr", "batch_size": args.eval_batch,
                     **({"metrics": args.metrics.split(",")}
                        if args.metrics else {})},
        },
    }))

    solver = run_main(cfg, mode="test", return_solver=True)  # warm: compiles
    n = len(solver.test_loader)
    t0 = time.perf_counter()
    summary = solver.inference(save=False)
    wall = time.perf_counter() - t0
    print(f"utterances: {n} x {args.seconds}s")
    print(f"end-to-end mode=test: {wall:.2f} s total, "
          f"{n / wall:.2f} utt/s, RTF {n * args.seconds / wall:.1f}x")
    print(f"summary: {summary}")


if __name__ == "__main__":
    main()
