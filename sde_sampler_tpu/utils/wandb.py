"""Weights & Biases shim: uses the real wandb package when importable,
otherwise no-ops so training runs are fully self-contained.

The reference depends on wandb unconditionally (utils/wandb.py, solver
logging); this environment has no wandb, so all logging flows to
metrics.jsonl and PNGs, with wandb as an optional extra sink.
"""
from __future__ import annotations

import logging

try:
    import wandb as _wandb

    HAS_WANDB = True
except ImportError:  # pragma: no cover - depends on environment
    _wandb = None
    HAS_WANDB = False

run = None


def init(**kwargs):
    global run
    if HAS_WANDB:
        run = _wandb.init(**kwargs)
    else:
        logging.debug("wandb unavailable; logging to disk only.")
    return run


def log(metrics: dict, step: int | None = None, commit: bool = True):
    if HAS_WANDB and _wandb.run is not None:
        _wandb.log(metrics, step=step, commit=commit)


def summary_update(data: dict):
    if HAS_WANDB and _wandb.run is not None:
        for k, v in data.items():
            _wandb.run.summary[k] = v


def finish():
    if HAS_WANDB and _wandb.run is not None:
        _wandb.finish()
