#!/usr/bin/env python
"""Ingest real VoiceBank-DEMAND / Clarity corpora into the expected layout.

The reference trains on real trees located by name (reference
src/distrib.py:102-103 finds ``noisy_trainset``/``clean_trainset`` folders;
src/dataset.py:172-411 reads Clarity ``train/scenes`` + metadata JSON). This
image has no network egress, so this tool takes already-downloaded local
trees and lays them out for ``configs/*.yaml``:

VoiceBank-DEMAND (https://datashare.ed.ac.uk/handle/10283/2791 — download
clean_trainset_28spk_wav.zip, noisy_trainset_28spk_wav.zip + testset zips):

  python tools/prepare_data.py vbd --src /path/to/VBD --dst ./data/VoiceBank-DEMAND \
      [--sample-rate 16000] [--copy]

  Produces {dst}/{noisy_trainset_wav,clean_trainset_wav}[,*_testset_wav]
  with paired file names. Source 48 kHz wavs are resampled when
  --sample-rate is given (otherwise symlinked/copied verbatim; the loader
  also resamples on the fly, dset.sample_rate).

Clarity Enhancement Challenge (https://claritychallenge.org — clarity_CEC1
or CEC2 data package):

  python tools/prepare_data.py clarity --src /path/to/clarity_data --dst ./data/Clarity [--copy]

  Produces {dst}/train/scenes, {dst}/dev/scenes, {dst}/custom_metadata/
  (scenes.train.json / scenes.dev.json / scenes.train.time.json built by
  scanning the scene wavs) and {dst}/metadata/{listeners.json,
  scenes_listeners.json} for hearing-aid scoring (configs/ha_clarity.yaml).

The quality-parity protocol that consumes these trees is documented in
docs/QUALITY_PARITY.md.
"""

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _place(src: str, dst: str, copy: bool):
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.lexists(dst):
        return
    if copy:
        shutil.copy2(src, dst)
    else:
        os.symlink(os.path.abspath(src), dst)


def _resample_wav(src: str, dst: str, sr: int):
    from speech_enhancement_tpu.data.wav_io import read_wav, write_wav
    from speech_enhancement_tpu.ops.resample import resample_frac
    import jax.numpy as jnp
    import numpy as np

    wav, file_sr = read_wav(src)
    if file_sr != sr:
        wav = np.asarray(resample_frac(jnp.asarray(wav), file_sr, sr))
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    write_wav(dst, wav, sr)


def _find_dir(src: str, needle: str):
    """First directory under src whose name contains needle (the reference's
    find_folder contract, src/distrib.py:102)."""
    hits = sorted(
        d for d, _, files in os.walk(src)
        if needle in os.path.basename(d) and any(f.endswith(".wav") for f in files)
    )
    return hits[0] if hits else None


def prepare_vbd(src: str, dst: str, sample_rate: int, copy: bool):
    pairs = [
        ("noisy_trainset", "noisy_trainset_wav"),
        ("clean_trainset", "clean_trainset_wav"),
        ("noisy_testset", "noisy_testset_wav"),
        ("clean_testset", "clean_testset_wav"),
    ]
    placed = {}
    for needle, out_name in pairs:
        found = _find_dir(src, needle)
        if found is None:
            if "trainset" in needle:
                raise SystemExit(f"no '{needle}*' wav folder under {src}")
            continue  # test sets are optional
        out_dir = os.path.join(dst, out_name)
        wavs = sorted(glob.glob(os.path.join(found, "*.wav")))
        for wav in wavs:
            target = os.path.join(out_dir, os.path.basename(wav))
            if sample_rate:
                _resample_wav(wav, target, sample_rate)
            else:
                _place(wav, target, copy)
        placed[out_name] = len(wavs)
    # paired-name sanity: every noisy train wav must have a clean twin
    noisy = {os.path.basename(p) for p in
             glob.glob(os.path.join(dst, "noisy_trainset_wav", "*.wav"))}
    clean = {os.path.basename(p) for p in
             glob.glob(os.path.join(dst, "clean_trainset_wav", "*.wav"))}
    missing = sorted(noisy - clean)[:5]
    if missing:
        raise SystemExit(f"unpaired noisy wavs (no clean twin): {missing} ...")
    print(json.dumps({"dataset": "VoiceBank-DEMAND", "root": dst, **placed}))


_SCENE_RE = re.compile(r"^(S\d+)_mix_CH1\.wav$")


def _clarity_scan(scene_dir: str):
    scenes = sorted(
        m.group(1) for f in os.listdir(scene_dir)
        if (m := _SCENE_RE.match(f))
    )
    return scenes


def prepare_clarity_tree(src: str, dst: str, copy: bool):
    from speech_enhancement_tpu.data.wav_io import read_wav

    placed = {}
    for split in ("train", "dev"):
        found = None
        for cand in (os.path.join(src, split, "scenes"),
                     os.path.join(src, "clarity_data", split, "scenes")):
            if os.path.isdir(cand):
                found = cand
                break
        if found is None:
            if split == "train":
                raise SystemExit(f"no {split}/scenes under {src}")
            continue
        out_dir = os.path.join(dst, split, "scenes")
        wavs = sorted(glob.glob(os.path.join(found, "*.wav")))
        for wav in wavs:
            _place(wav, os.path.join(out_dir, os.path.basename(wav)), copy)
        scenes = _clarity_scan(out_dir)
        placed[split] = len(scenes)

        meta_dir = os.path.join(dst, "custom_metadata")
        os.makedirs(meta_dir, exist_ok=True)
        with open(os.path.join(meta_dir, f"scenes.{split}.json"), "w") as fh:
            json.dump(scenes, fh)
        if split == "train":
            # target-active spans: the reference reads them from the data
            # package metadata (dataset.py:237-249); absent that, the full
            # utterance span keeps every segment trainable
            times = {}
            src_meta = None
            for cand in (os.path.join(src, "metadata", "scenes.train.json"),
                         os.path.join(src, "clarity_data", "metadata",
                                      "scenes.train.json")):
                if os.path.exists(cand):
                    src_meta = cand
                    break
            spans_from_meta = {}
            if src_meta:
                with open(src_meta) as fh:
                    raw = json.load(fh)
                for item in raw if isinstance(raw, list) else []:
                    scene = item.get("scene")
                    tgt = item.get("target", {})
                    if scene and "time_start" in tgt:
                        spans_from_meta[scene] = [int(tgt["time_start"]),
                                                  int(tgt["time_end"])]
            for scene in scenes:
                if scene in spans_from_meta:
                    times[scene] = spans_from_meta[scene]
                else:
                    wav, _ = read_wav(
                        os.path.join(out_dir, f"{scene}_mix_CH1.wav"))
                    times[scene] = [0, int(wav.shape[-1])]
            with open(os.path.join(meta_dir, "scenes.train.time.json"),
                      "w") as fh:
                json.dump(times, fh)

    # hearing-aid metadata for configs/ha_clarity.yaml
    ha_meta = os.path.join(dst, "metadata")
    os.makedirs(ha_meta, exist_ok=True)
    for name in ("listeners.json", "scenes_listeners.json"):
        for cand in (os.path.join(src, "metadata", name),
                     os.path.join(src, "clarity_data", "metadata", name)):
            if os.path.exists(cand):
                _place(cand, os.path.join(ha_meta, name), copy)
                placed[name] = True
                break
    print(json.dumps({"dataset": "Clarity", "root": dst, **placed}))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("vbd", "clarity"):
        p = sub.add_parser(name)
        p.add_argument("--src", required=True, help="downloaded corpus root")
        p.add_argument("--dst", required=True, help="output tree for configs")
        p.add_argument("--copy", action="store_true",
                       help="copy files instead of symlinking")
        if name == "vbd":
            p.add_argument("--sample-rate", type=int, default=0,
                           help="resample wavs (e.g. 16000); 0 = keep as-is")
    args = ap.parse_args()
    if args.cmd == "vbd":
        prepare_vbd(args.src, args.dst, args.sample_rate, args.copy)
    else:
        prepare_clarity_tree(args.src, args.dst, args.copy)


if __name__ == "__main__":
    main()
