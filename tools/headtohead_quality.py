#!/usr/bin/env python
"""Head-to-head quality parity: this framework vs the EXECUTED reference.

BASELINE.md's north star asks for SI-SNR/PESQ parity with the reference
(ooshyun/Speech-Enhancement-Pytorch). The real VoiceBank-DEMAND corpus is
not available in this image (zero egress; see tools/prepare_data.py +
docs/QUALITY_PARITY.md for the real-corpus protocol), so this tool runs
the strongest comparison the image allows: BOTH frameworks train the SAME
flagship architecture (DCCRN, reference defaults) on the SAME synthetic
VoiceBank-DEMAND-layout fixture with the SAME hyperparameters
(Adam 3e-4, clip 5, si-sdr loss, batch 16, identical epochs, identical
train/val/test utterance split), and the SAME held-out utterances are
scored with the SAME metrics (SI-SDR / STOI / PESQ, train/metrics.py) and
the SAME windowed overlap-discard inference protocol.

The reference side EXECUTES /root/reference/src/model/dccrn.py +
src/loss.py as-is (importlib — the same golden-oracle mechanism as
tests/test_parity.py; no reference code is copied) with a minimal torch
train loop standing in for its solver (its full stack needs
librosa/omegaconf, absent here; the loop reproduces solver.py:440-498:
forward -> si-sdr loss -> clip_grad_norm_(5) -> Adam step, per-epoch val
loss, best-val weights kept). The reference trains f32 on CPU (its native
device in this image); ours trains its shipped bf16 fast path on TPU.

Phases (run separately; each writes JSON under --out):
  python tools/headtohead_quality.py fixture   # build the shared corpus
  python tools/headtohead_quality.py ours      # train+test ours (TPU, ~10 min)
  python tools/headtohead_quality.py ref       # train+test reference (CPU, ~2 h)
  python tools/headtohead_quality.py report    # print the comparison table

To-convergence mode (reference early-stop contract, src/solver.py:355-384:
patience counted over non-improving validations, training stops when the
counter exceeds it; --epochs becomes the hard cap):
  python tools/headtohead_quality.py ours --patience 10 --epochs 80 --seed 10
  python tools/headtohead_quality.py ref  --patience 10 --epochs 80 --seed 10
  python tools/headtohead_quality.py report --seeds 10,20,30
With --patience set, artifacts are written per-seed ({side}_s{seed}.json)
and the ref phase checkpoints EVERY epoch so an interrupted run stays
evaluable via the refeval phase. Both sides evaluate the state training
left behind (the reference's own test flow resumes latest_model.tar,
solver.py:233-257); the ref artifact additionally scores its best-val
weights for context.
"""

import argparse
import faulthandler
import importlib.util
import json
import os
import signal
import sys
import time

# kill -USR1 <pid> dumps all thread stacks instead of terminating the run
# (same diagnosability hook as main.py; SIGUSR1's default disposition kills).
if hasattr(signal, "SIGUSR1"):
    faulthandler.register(signal.SIGUSR1, all_threads=True, chain=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE = "/tmp/h2h_vbd"
OUT = "/tmp/h2h"
EPOCHS = 25
BATCH = 16
SEED = 10
PATIENCE = None  # int -> to-convergence mode (early stop, EPOCHS = cap)
SPLIT = [0.8, 0.1, 0.1]  # ~9 held-out test utterances from 96
REF_DCCRN = "/root/reference/src/model/dccrn.py"
REF_LOSS = "/root/reference/src/loss.py"

MODEL_KW = dict(rnn_layers=2, rnn_units=128, win_len=400, win_inc=100,
                fft_len=512, masking_mode="E", use_clstm=True, use_cbn=True,
                kernel_size=5, kernel_num=[16, 32, 64, 128, 256, 256])


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _config(tmp_root: str):
    from speech_enhancement_tpu.config import load_config

    cfg = load_config("configs/dccrn_vbd.yaml")
    cfg.dset.wav = FIXTURE
    cfg.dset.split = SPLIT
    cfg.seed = SEED
    cfg.solver.epochs = EPOCHS
    cfg.solver.root = tmp_root
    cfg.solver.batch_size = BATCH
    cfg.solver.test.total_steps = 0  # score every held-out utterance
    if PATIENCE is not None:
        cfg.solver.patience = PATIENCE
    return cfg


def _tag(side: str) -> str:
    """Artifact basename: per-seed in to-convergence mode, legacy otherwise."""
    return f"{side}_s{SEED}" if PATIENCE is not None else side


def build_fixture():
    from speech_enhancement_tpu.data.synthetic import make_voicebank_demand

    make_voicebank_demand(FIXTURE, n_utterances=96, min_seconds=4.0,
                          max_seconds=6.0, seed=0)
    print(f"fixture at {FIXTURE} (96 utterances, 4-6 s, ~0 dB)")


def run_ours():
    """Train + test this framework through its own CLI path.

    Wall-clock is broken out so the headline number can't be misread:
    ``setup`` (data+model+solver build), ``first_epoch`` (includes the jitted
    train/val-step compiles — one-time, served from the persistent compile
    cache on reruns), ``steady_epochs`` (everything after epoch 0: the number
    a long run extrapolates from), and ``inference`` (windowed eval + host
    metric scoring of the held-out utterances).
    """
    import yaml

    from speech_enhancement_tpu.config import obj2dict
    from speech_enhancement_tpu.main import main

    cfg = _config(os.path.join(OUT, _tag("ours")))
    os.makedirs(OUT, exist_ok=True)
    cfg_path = os.path.join(OUT, _tag("ours") + ".yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(obj2dict(cfg), fh)

    t0 = time.time()
    solver = main(cfg_path, mode=None, return_solver=True)  # build only
    t_setup = time.time()
    scores = solver.train()
    t_train = time.time()
    summary = solver.inference()
    t_eval = time.time()
    epochs_ran = len(scores.get("train_loss", []))
    epoch_walls = scores.get("epoch_wall_s") or []
    summary["train_wall_s"] = t_train - t0
    summary["epochs"] = epochs_ran
    summary["best_val"] = scores.get("best_score")
    summary["wall_breakdown_s"] = {
        "setup": round(t_setup - t0, 1),
        "train_total": round(t_train - t_setup, 1),
        "first_epoch": round(epoch_walls[0], 1) if epoch_walls else None,
        "steady_epochs": (round(sum(epoch_walls[1:]), 1)
                          if len(epoch_walls) > 1 else None),
        "inference": round(t_eval - t_train, 1),
    }
    summary["val_log"] = scores.get("val_loss", [])
    with open(os.path.join(OUT, _tag("ours") + ".json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


# ---------------------------------------------------------------- reference
def _eval_torch_windowed(torch_model, mixture: np.ndarray, window: int,
                         stride: int):
    """The same normalize -> zero-filled windows -> model -> overlap-discard
    protocol as train/evaluate.py, numpy+torch (reference evaluate.py:10-98
    semantics; mono z-score)."""
    import torch

    length = mixture.shape[-1]
    mean = mixture.mean(axis=-1, keepdims=True)
    std = mixture.std(axis=-1, keepdims=True, ddof=1)
    x = (mixture - mean) / (std + 1e-9)

    n_win = 1 if length <= window else -(-(length - window) // stride) + 1
    total = window + (n_win - 1) * stride
    xp = np.zeros(x.shape[:-1] + (total,), np.float32)
    xp[..., :length] = x
    wins = np.stack([xp[..., k * stride:k * stride + window]
                     for k in range(n_win)])  # [N, C, W]
    with torch.no_grad():
        out = torch_model(torch.from_numpy(wins[:, 0]))  # [N, W'] or [N, 1, W']
        if isinstance(out, (tuple, list)):
            out = out[-1]
        out = out.numpy()
    if out.ndim == 3:  # reference DCCRN emits [N, 1, T]
        out = out[:, 0]
    if out.shape[-1] < window:  # reference iSTFT may trim the tail
        out = np.pad(out, [(0, 0), (0, window - out.shape[-1])])
    # overlap-discard (reference evaluate.py:84-90): window 0 whole, then
    # each window's last `stride` samples
    full = [out[0]] + [out[k][-stride:] for k in range(1, n_win)]
    enhanced = np.concatenate(full, axis=-1)[:length][None]  # [1, T]
    if enhanced.shape[-1] < length:
        enhanced = np.pad(enhanced, [(0, 0), (0, length - enhanced.shape[-1])])
    return enhanced * (std + 1e-9) + mean


def run_ref(eval_only=False):
    import torch

    from speech_enhancement_tpu.data.loader import (SegmentLoader,
                                                    get_train_wav_dataset)
    from speech_enhancement_tpu.train import metrics as metrics_lib

    torch.manual_seed(SEED)
    cfg = _config(os.path.join(OUT, _tag("ref")))
    train_ds, val_ds, test_ds = get_train_wav_dataset(
        cfg.dset, cfg.model, seed=SEED)
    seg = int(cfg.dset.sample_rate * cfg.dset.segment)
    train_loader = SegmentLoader(train_ds, batch_size=BATCH,
                                 segment_length=seg, seed=SEED)
    val_loader = SegmentLoader(val_ds, batch_size=BATCH, segment_length=seg,
                               shuffle=False, drop_last=False, seed=SEED)

    ref = _load_ref(REF_DCCRN, "h2h_ref_dccrn")
    ref_loss = _load_ref(REF_LOSS, "h2h_ref_loss")
    model = ref.DCCRN(**MODEL_KW)
    opt = torch.optim.Adam(model.parameters(), lr=3e-4, betas=(0.9, 0.999))

    def batch_loss(batch):
        mix = torch.from_numpy(np.asarray(batch["mixture"][:, 0]))  # [B, T]
        clean = torch.from_numpy(np.asarray(batch["sources"][:, 0, 0]))
        est = model(mix)
        if isinstance(est, (tuple, list)):
            est = est[-1]
        n = min(est.shape[-1], clean.shape[-1])
        return ref_loss.loss_sisdr(est[..., :n], clean[..., :n])

    best = {"val": float("inf"), "state": None}
    log = []
    tag = _tag("ref")
    ckpt = os.path.join(OUT, tag + "_final.pt")
    best_ckpt = os.path.join(OUT, tag + "_best.pt")
    log_path = os.path.join(OUT, tag + "_log.json")
    if eval_only:  # resume a crash after training: reuse the saved weights
        model.load_state_dict(torch.load(ckpt, weights_only=True))
        with open(log_path) as fh:
            log = json.load(fh)
        best = {"val": min(e["val"] for e in log), "state": None}
    early_stop = 0
    for epoch in range(0 if eval_only else EPOCHS):
        t0 = time.time()
        model.train()
        tr = []
        for batch in train_loader:
            opt.zero_grad()
            loss = batch_loss(batch)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
            opt.step()
            tr.append(float(loss))
        model.eval()
        with torch.no_grad():
            va = [float(batch_loss(b)) for b in val_loader]
        val = float(np.mean(va))
        if val < best["val"]:
            best = {"val": val,
                    "state": {k: v.detach().clone()
                              for k, v in model.state_dict().items()}}
            early_stop = 0
        else:
            early_stop += 1
        log.append({"epoch": epoch, "train": float(np.mean(tr)), "val": val,
                    "wall": time.time() - t0})
        print(f"ref epoch {epoch}: train={np.mean(tr):.3f} val={val:.3f} "
              f"best={best['val']:.3f} ({log[-1]['wall']:.0f}s)", flush=True)
        with open(log_path, "w") as fh:
            json.dump(log, fh)
        if PATIENCE is not None:
            # checkpoint every epoch: a multi-hour CPU run interrupted by the
            # wall clock stays evaluable through the refeval phase
            torch.save(model.state_dict(), ckpt)
            if best["state"] is not None:
                torch.save(best["state"], best_ckpt)
            if early_stop > PATIENCE:  # reference contract solver.py:383-384
                print(f"ref early stopping at epoch {epoch} "
                      f"(patience {PATIENCE})", flush=True)
                break

    if not eval_only:  # persist so eval crashes never cost the training
        torch.save(model.state_dict(), ckpt)
        if best["state"] is not None:
            torch.save(best["state"], best_ckpt)

    # evaluate the FINAL state: both sides test what training left behind
    # (the reference's own test flow resumes latest_model.tar, solver.py:
    # 233-257, and ours mirrors it — patience 40 > 25 epochs, no early stop)
    model.eval()

    window = int(cfg.dset.sample_rate * cfg.model.segment)
    stride = int(cfg.model.win_length)
    include = ("sisdr", "stoi", "pesq")
    sr = int(cfg.dset.sample_rate)

    def score_current():
        agg = {"enhanced": {k: [] for k in include},
               "mixture": {k: [] for k in include}}
        for i in range(len(test_ds)):
            item = test_ds[i]
            mixture = np.asarray(item["mixture"])  # [C, T]
            clean = np.asarray(item["sources"][0])[None]  # [1, C, T]
            enhanced = _eval_torch_windowed(model, mixture, window,
                                            stride)[None]
            m_enh = metrics_lib.compute_metrics(clean, enhanced, sr, include)
            m_mix = metrics_lib.compute_metrics(clean, mixture[None], sr,
                                                include)
            for key in include:
                if m_enh.get(key) is not None:
                    agg["enhanced"][key].append(m_enh[key])
                    agg["mixture"][key].append(m_mix[key])
        return {side: {k: float(np.mean(v)) for k, v in vals.items() if v}
                for side, vals in agg.items()}

    summary = score_current()
    if PATIENCE is not None and os.path.exists(best_ckpt):
        # context row: the best-val weights (ours evaluates final state like
        # the reference's own latest_model.tar test flow; report both here)
        model.load_state_dict(torch.load(best_ckpt, weights_only=True))
        model.eval()
        summary["enhanced_best_val"] = score_current()["enhanced"]
    summary["epochs"] = len(log)
    summary["best_val"] = best["val"]
    summary["train_wall_s"] = float(sum(e["wall"] for e in log))
    with open(os.path.join(OUT, tag + ".json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


def _load_side(side: str, seeds):
    """Load per-seed artifacts ({side}_s{seed}.json), falling back to the
    legacy single-run name when no per-seed file exists."""
    out = {}
    for seed in seeds:
        path = os.path.join(OUT, f"{side}_s{seed}.json")
        if os.path.exists(path):
            with open(path) as fh:
                out[seed] = json.load(fh)
    if not out and os.path.exists(os.path.join(OUT, side + ".json")):
        with open(os.path.join(OUT, side + ".json")) as fh:
            out["legacy"] = json.load(fh)
    return out


def report(seeds=(SEED,)):
    ours = _load_side("ours", seeds)
    ref = _load_side("ref", seeds)
    if not ours or not ref:
        sys.exit(f"missing artifacts under {OUT} (ours: {sorted(ours)}, "
                 f"ref: {sorted(ref)})")

    def stat(side, key, field="enhanced"):
        vals = [run[field][key] for run in side.values()
                if run.get(field, {}).get(key) is not None]
        return (float(np.mean(vals)), float(np.std(vals))) if vals else (
            float("nan"), 0.0)

    any_run = next(iter(ref.values()))
    print(f"seeds: ours={sorted(ours)} ref={sorted(ref)}")
    print(f"{'metric':12s} {'mixture':>9s} {'reference':>16s} {'ours':>16s}"
          f" {'delta':>8s}")
    for key in ("sisdr", "stoi", "pesq"):
        mix = any_run["mixture"].get(key, float("nan"))
        rm, rs = stat(ref, key)
        om, os_ = stat(ours, key)
        print(f"{key:12s} {mix:9.3f} {rm:10.3f}±{rs:5.3f} "
              f"{om:10.3f}±{os_:5.3f} {om - rm:+8.3f}")
    rw = [r["train_wall_s"] for r in ref.values()]
    ow = [o["train_wall_s"] for o in ours.values()]
    re_ = [r["epochs"] for r in ref.values()]
    oe = [o["epochs"] for o in ours.values()]
    print(f"train wall  reference {np.mean(rw):.0f}s ({re_} epochs)   "
          f"ours {np.mean(ow):.0f}s ({oe} epochs)")
    for seed, o in ours.items():
        if o.get("wall_breakdown_s"):
            print(f"ours seed {seed} wall breakdown: {o['wall_breakdown_s']}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase",
                    choices=["fixture", "ours", "ref", "refeval", "report"])
    ap.add_argument("--epochs", type=int, default=EPOCHS,
                    help="epoch budget (fixed mode) or hard cap "
                         "(with --patience)")
    ap.add_argument("--patience", type=int, default=None,
                    help="to-convergence mode: early-stop patience "
                         "(reference src/solver.py:355-384 contract)")
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--seeds", default=None,
                    help="report phase: comma-separated seed list")
    args = ap.parse_args()
    EPOCHS = args.epochs
    PATIENCE = args.patience
    SEED = args.seed
    os.makedirs(OUT, exist_ok=True)
    if args.phase == "report":
        seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
                 else [SEED])
        report(seeds)
    else:
        {"fixture": build_fixture, "ours": run_ours, "ref": run_ref,
         "refeval": lambda: run_ref(eval_only=True)}[args.phase]()
