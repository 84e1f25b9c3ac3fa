"""Checkpoint artifacts matching the reference's run-dir contract.

Reference (src/solver.py:295-341): per run dir
``result/{model}/{timestamp}/checkpoints/`` holds ``latest_model.tar`` (full
state), ``model_{epoch:04d}_{metric}_{score}.pth`` (weights only),
``best_model.tar`` and ``state.json`` (score history). Here the same
artifact set is written with flax msgpack serialization:
``latest_model.ckpt`` / ``model_{...}.ckpt`` / ``best_model.ckpt`` /
``state.json``. Resume restores weights + best score and optionally the
optimizer (solver.py:233-260); preload loads bare weights non-strictly
(solver.py:262-279).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

from speech_enhancement_tpu.config import load_json, save_json


def save_checkpoint(
    checkpoint_dir: str,
    state: Dict[str, Any],
    epoch: int,
    metric: str,
    score: float,
    scores: Dict,
    is_best: bool,
) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    # ONE batched device->host transfer before serializing: msgpack walks
    # leaves serially, and per-leaf fetches through the TPU relay cost a
    # full round trip each (~0.2 s x 458 leaves = ~95 s measured vs ~0.04 s
    # after a batched jax.device_get — NOTES_DEV.md round-2 log).
    state = jax.device_get(state)
    blob = serialization.msgpack_serialize(_to_pure(state))
    with open(os.path.join(checkpoint_dir, "latest_model.ckpt"), "wb") as handle:
        handle.write(blob)
    weights = serialization.msgpack_serialize(_to_pure({"params": state["params"]}))
    name = f"model_{epoch:04d}_{metric}_{score:.4f}.ckpt"
    with open(os.path.join(checkpoint_dir, name), "wb") as handle:
        handle.write(weights)
    if is_best:
        with open(os.path.join(checkpoint_dir, "best_model.ckpt"), "wb") as handle:
            handle.write(blob)
    save_json(scores, os.path.join(checkpoint_dir, "state.json"))


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a checkpoint file into the structure of ``template``.

    Top-level template keys missing from the blob (e.g. ``step`` in
    round-2-era checkpoints, added to the artifact later) keep their
    template value instead of failing the restore.
    """
    with open(path, "rb") as handle:
        raw = serialization.msgpack_restore(handle.read())
    present = {k: v for k, v in template.items() if k in raw}
    restored = dict(template)
    restored.update(serialization.from_state_dict(present, raw))
    return restored


def latest_checkpoint(run_dir: str) -> Optional[str]:
    path = os.path.join(run_dir, "checkpoints", "latest_model.ckpt")
    return path if os.path.exists(path) else None


def load_scores(run_dir: str) -> Optional[Dict]:
    path = os.path.join(run_dir, "checkpoints", "state.json")
    return load_json(path) if os.path.exists(path) else None


def _to_pure(tree):
    return serialization.to_state_dict(tree)
