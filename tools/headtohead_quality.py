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
    faulthandler.register(signal.SIGUSR1, all_threads=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE = "/tmp/h2h_vbd"
OUT = "/tmp/h2h"
EPOCHS = 25
BATCH = 16
SEED = 10
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
    return cfg


def build_fixture():
    from speech_enhancement_tpu.data.synthetic import make_voicebank_demand

    make_voicebank_demand(FIXTURE, n_utterances=96, min_seconds=4.0,
                          max_seconds=6.0, seed=0)
    print(f"fixture at {FIXTURE} (96 utterances, 4-6 s, ~0 dB)")


def run_ours():
    """Train + test this framework through its own CLI path."""
    import yaml

    from speech_enhancement_tpu.config import obj2dict
    from speech_enhancement_tpu.main import main

    cfg = _config(os.path.join(OUT, "ours"))
    os.makedirs(OUT, exist_ok=True)
    cfg_path = os.path.join(OUT, "ours.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(obj2dict(cfg), fh)

    t0 = time.time()
    solver = main(cfg_path, mode="train", return_solver=True)
    train_wall = time.time() - t0
    summary = solver.inference()
    summary["train_wall_s"] = train_wall
    summary["epochs"] = EPOCHS
    with open(os.path.join(OUT, "ours.json"), "w") as fh:
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
    cfg = _config(os.path.join(OUT, "ref"))
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
    ckpt = os.path.join(OUT, "ref_final.pt")
    if eval_only:  # resume a crash after training: reuse the saved weights
        model.load_state_dict(torch.load(ckpt, weights_only=True))
        with open(os.path.join(OUT, "ref_log.json")) as fh:
            log = json.load(fh)
        best = {"val": min(e["val"] for e in log), "state": None}
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
        log.append({"epoch": epoch, "train": float(np.mean(tr)), "val": val,
                    "wall": time.time() - t0})
        print(f"ref epoch {epoch}: train={np.mean(tr):.3f} val={val:.3f} "
              f"best={best['val']:.3f} ({log[-1]['wall']:.0f}s)", flush=True)
        with open(os.path.join(OUT, "ref_log.json"), "w") as fh:
            json.dump(log, fh)

    if not eval_only:  # persist so eval crashes never cost the training
        torch.save(model.state_dict(), ckpt)
        if best["state"] is not None:
            torch.save(best["state"], os.path.join(OUT, "ref_best.pt"))

    # evaluate the FINAL state: both sides test what training left behind
    # (the reference's own test flow resumes latest_model.tar, solver.py:
    # 233-257, and ours mirrors it — patience 40 > 25 epochs, no early stop)
    model.eval()

    window = int(cfg.dset.sample_rate * cfg.model.segment)
    stride = int(cfg.model.win_length)
    agg = {"enhanced": {"sisdr": [], "stoi": [], "pesq": []},
           "mixture": {"sisdr": [], "stoi": [], "pesq": []}}
    include = ("sisdr", "stoi", "pesq")
    for i in range(len(test_ds)):
        item = test_ds[i]
        mixture = np.asarray(item["mixture"])  # [C, T]
        clean = np.asarray(item["sources"][0])[None]  # [1, C, T]
        enhanced = _eval_torch_windowed(model, mixture, window, stride)[None]
        sr = int(cfg.dset.sample_rate)
        m_enh = metrics_lib.compute_metrics(clean, enhanced, sr, include)
        m_mix = metrics_lib.compute_metrics(clean, mixture[None], sr, include)
        for key in include:
            if m_enh.get(key) is not None:
                agg["enhanced"][key].append(m_enh[key])
                agg["mixture"][key].append(m_mix[key])
    summary = {side: {k: float(np.mean(v)) for k, v in vals.items() if v}
               for side, vals in agg.items()}
    summary["epochs"] = len(log)
    summary["best_val"] = best["val"]
    summary["train_wall_s"] = float(sum(e["wall"] for e in log))
    with open(os.path.join(OUT, "ref.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


def report():
    with open(os.path.join(OUT, "ours.json")) as fh:
        ours = json.load(fh)
    with open(os.path.join(OUT, "ref.json")) as fh:
        ref = json.load(fh)
    print(f"{'metric':12s} {'mixture':>9s} {'reference':>10s} {'ours':>9s}")
    for key in ("sisdr", "stoi", "pesq"):
        mix = ref["mixture"].get(key, ours["mixture"].get(key))
        print(f"{key:12s} {mix:9.3f} {ref['enhanced'].get(key, float('nan')):10.3f} "
              f"{ours['enhanced'].get(key, float('nan')):9.3f}")
    print(f"train wall  reference {ref['train_wall_s']:.0f}s   "
          f"ours {ours['train_wall_s']:.0f}s   "
          f"({ref['epochs']}/{ours['epochs']} epochs ref/ours)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("phase",
                    choices=["fixture", "ours", "ref", "refeval", "report"])
    ap.add_argument("--epochs", type=int, default=EPOCHS,
                    help="override the shared epoch budget (use the same "
                         "value for the ours and ref phases)")
    args = ap.parse_args()
    EPOCHS = args.epochs
    os.makedirs(OUT, exist_ok=True)
    {"fixture": build_fixture, "ours": run_ours, "ref": run_ref,
     "refeval": lambda: run_ref(eval_only=True),
     "report": report}[args.phase]()
