"""Synthetic dataset fixtures: tone+noise wav trees for hermetic tests/demos.

The reference has no hermetic test data — its tests require real
VoiceBank-DEMAND / Clarity trees on disk (SURVEY §4). These builders create
miniature datasets with the same directory layouts so every pipeline test
runs anywhere.
"""

from __future__ import annotations

import json
import os

import numpy as np

from speech_enhancement_tpu.data.wav_io import write_wav


def _speech_like(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    t = np.arange(n) / sr
    f0 = rng.uniform(120, 300)
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t))
    sig = np.zeros(n)
    for harmonic in (1, 2, 3):
        sig += rng.uniform(0.2, 1.0) / harmonic * np.sin(2 * np.pi * f0 * harmonic * t)
    return (0.3 * env * sig).astype(np.float32)


def make_voicebank_demand(
    root: str,
    n_utterances: int = 8,
    sr: int = 16000,
    min_seconds: float = 1.0,
    max_seconds: float = 3.0,
    channels: int = 1,
    seed: int = 0,
) -> str:
    """Create {root}/{noisy_trainset_wav,clean_trainset_wav}/p000_XXX.wav pairs."""
    rng = np.random.default_rng(seed)
    noisy_dir = os.path.join(root, "noisy_trainset_wav")
    clean_dir = os.path.join(root, "clean_trainset_wav")
    os.makedirs(noisy_dir, exist_ok=True)
    os.makedirs(clean_dir, exist_ok=True)
    for i in range(n_utterances):
        n = int(sr * rng.uniform(min_seconds, max_seconds))
        clean = np.stack([_speech_like(rng, n, sr) for _ in range(channels)])
        noise = 0.1 * rng.standard_normal((channels, n)).astype(np.float32)
        name = f"p000_{i:03d}.wav"
        write_wav(os.path.join(clean_dir, name), clean, sr)
        write_wav(os.path.join(noisy_dir, name), clean + noise, sr)
    return root


def make_clarity(
    root: str,
    n_scenes: int = 4,
    sr: int = 16000,
    seconds: float = 2.0,
    seed: int = 0,
) -> str:
    """Create a miniature Clarity train tree with CH0..CH3 + metadata JSON."""
    rng = np.random.default_rng(seed)
    scene_dir = os.path.join(root, "train", "scenes")
    dev_dir = os.path.join(root, "dev", "scenes")
    meta_dir = os.path.join(root, "custom_metadata")
    os.makedirs(scene_dir, exist_ok=True)
    os.makedirs(dev_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    scenes = [f"S{i:05d}" for i in range(1, n_scenes + 1)]
    n = int(sr * seconds)
    times = {}
    for scene in scenes:
        target = np.stack([_speech_like(rng, n, sr) for _ in range(2)])
        interferer = 0.2 * np.stack(
            [_speech_like(rng, n, sr) for _ in range(2)]
        ) + 0.05 * rng.standard_normal((2, n)).astype(np.float32)
        interferer = interferer.astype(np.float32)
        for ch in ("CH0", "CH1", "CH2", "CH3"):
            write_wav(os.path.join(scene_dir, f"{scene}_target_{ch}.wav"), target, sr)
            write_wav(
                os.path.join(scene_dir, f"{scene}_target_anechoic_{ch}.wav"), target, sr
            )
            write_wav(
                os.path.join(scene_dir, f"{scene}_interferer_{ch}.wav"), interferer, sr
            )
            write_wav(
                os.path.join(scene_dir, f"{scene}_mix_{ch}.wav"), target + interferer, sr
            )
        times[scene] = [0, n]
        # dev split mirrors CH1 files only (the eval path, dataset.py:280-292)
        for kind in ("target", "target_anechoic", "interferer", "mix"):
            src = os.path.join(scene_dir, f"{scene}_{kind}_CH1.wav")
            dst = os.path.join(dev_dir, f"{scene}_{kind}_CH1.wav")
            with open(src, "rb") as fin, open(dst, "wb") as fout:
                fout.write(fin.read())
    with open(os.path.join(meta_dir, "scenes.train.json"), "w") as handle:
        json.dump(scenes, handle)
    with open(os.path.join(meta_dir, "scenes.dev.json"), "w") as handle:
        json.dump(scenes, handle)
    with open(os.path.join(meta_dir, "scenes.train.time.json"), "w") as handle:
        json.dump(times, handle)
    return root
