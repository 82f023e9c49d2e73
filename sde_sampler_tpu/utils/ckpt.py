"""Checkpointing of jax pytrees (save_attrs manifest protocol).

The reference checkpoints a state-dict per saved attribute
(solver/base.py:199-244, files ckpt/ckpt{suffix}.pt, latest-by-mtime
restore). Here the same manifest idea stores numpy-converted pytrees in a
single pickle per checkpoint; device placement is restored lazily on load
(arrays re-device when first used by jit).
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path

import jax
import numpy as np


def to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_checkpoint(path: Path | str, state: dict) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic write: a preemption mid-dump must not leave a truncated file
    # that latest_checkpoint (newest mtime) would pick on resume
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(to_host(state), f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: Path | str) -> dict:
    with open(Path(path), "rb") as f:
        return pickle.load(f)


def latest_checkpoint(ckpt_dir: Path | str) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    ckpts = list(ckpt_dir.glob("ckpt*.pkl"))
    if ckpts:
        return max(ckpts, key=os.path.getmtime)
    return None
