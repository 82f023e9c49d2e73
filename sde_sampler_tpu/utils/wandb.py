"""Weights & Biases integration: artifact checkpoints, preemption resume.

Capability parity with /root/reference/sde_sampler/utils/wandb.py
(format_fig, check_wandb guard, resume-config merge, checkpoint artifact
upload/restore/GC) and the resume-by-dir-hash flow of
/root/reference/scripts/main.py:49-73.

The real wandb package is absent in this environment, so the module
resolves its backend lazily: the genuine `wandb` when importable, an
injected stand-in via `use_backend()` (tests use tests/fake_wandb.py),
otherwise every call is a no-op and logging flows to metrics.jsonl/PNGs
only.
"""
from __future__ import annotations

import hashlib
import logging
from pathlib import Path

from sde_sampler_tpu.utils.common import CKPT_DIR

try:
    import wandb as _backend

    HAS_WANDB = True
except ImportError:  # pragma: no cover - depends on environment
    _backend = None
    HAS_WANDB = False

run = None


def use_backend(module):
    """Inject a wandb-compatible backend (tests); None restores no-op."""
    global _backend, HAS_WANDB, run
    _backend = module
    HAS_WANDB = module is not None
    run = getattr(module, "run", None) if module is not None else None
    return module


def _active_run():
    return getattr(_backend, "run", None) if HAS_WANDB else None


def run_id_for_dir(out_dir) -> str:
    """Run id = SHA-256 of the output dir, so a requeued (preempted) job
    resumes the same wandb run (reference scripts/main.py:49-53)."""
    sha = hashlib.sha256()
    sha.update(str(Path(out_dir).absolute()).encode())
    return sha.hexdigest()


def init(**kwargs):
    global run
    if HAS_WANDB:
        run = _backend.init(**kwargs)
    else:
        logging.debug("wandb unavailable; logging to disk only.")
    return run


def log(metrics: dict, step: int | None = None, commit: bool = True):
    if _active_run() is not None:
        _backend.log(metrics, step=step, commit=commit)


def summary_update(data: dict):
    active = _active_run()
    if active is not None:
        for k, v in data.items():
            active.summary[k] = v


def finish(exit_code: int | None = None):
    global run
    if _active_run() is not None:
        _backend.finish(exit_code=exit_code)
    run = None


def format_fig(fig):
    """PIL images and matplotlib figures must be wrapped for wandb.log."""
    if not HAS_WANDB:
        return fig
    try:
        from PIL.Image import Image as PILImage

        pil = (PILImage,)
    except ImportError:  # pragma: no cover
        pil = ()
    try:
        from matplotlib.figure import Figure as MplFigure

        mpl = (MplFigure,)
    except ImportError:  # pragma: no cover
        mpl = ()
    if isinstance(fig, pil + mpl):
        return _backend.Image(fig)
    return fig


def check_wandb(fun):
    """Run `fun` only when an active run in mode='run' exists
    (reference utils/wandb.py:23-42)."""

    def inner(*args, **kwargs):
        active = _active_run()
        mode = None
        if active is not None:
            settings = getattr(active, "settings", None)
            mode = getattr(settings, "mode", None)
            if mode == "run":
                return fun(*args, **kwargs)
        # debug (not warning) when the wandb package itself is absent:
        # every run in a wandb-less environment would warn otherwise
        log_fn = logging.warning if HAS_WANDB else logging.debug
        log_fn(
            "Wandb not available (mode=%s): unable to call %s.",
            mode or "none",
            fun.__name__,
        )

    inner.__name__ = getattr(fun, "__name__", "wrapped")
    return inner


@check_wandb
def merge_wandb_cfg(cfg: dict) -> dict:
    """Deep-merge the resumed run's stored config under the current cfg
    (current overrides win — reference utils/wandb.py:45-51)."""
    import copy

    from sde_sampler_tpu.utils.config import deep_merge

    wandb_config = copy.deepcopy(dict(_backend.run.config))
    wandb_config.pop("hydra", None)
    merged = deep_merge(wandb_config, dict(cfg))
    logging.info("Merged config with wandb config.")
    return merged


@check_wandb
def upload_ckpt(path, name: str = "ckpt"):
    """Upload a checkpoint file as a model artifact named after the run id
    (reference utils/wandb.py:54-63)."""
    name = f"{CKPT_DIR}/{name}"
    artifact = _backend.Artifact(
        _backend.run.id, type="model", metadata={"path": str(path), "name": name}
    )
    artifact.add_file(str(path), name=name)
    _backend.log_artifact(artifact)
    logging.info("Uploaded checkpoint %s to wandb.", name)


@check_wandb
def restore_ckpt(out_dir):
    """Download the latest checkpoint artifact of this run into out_dir
    (reference utils/wandb.py:66-77)."""
    try:
        artifact = _backend.run.use_artifact(f"{_backend.run.id}:latest")
        ckpt = artifact.download(str(out_dir))
        logging.info(
            "Checkpoint %s restored from wandb.",
            artifact.metadata.get("name", ckpt),
        )
    except _backend.CommError as exception:
        logging.debug("Wandb raised exception %s", exception)
        logging.info(
            "No previous checkpoints found for wandb id %s.", _backend.run.id
        )


@check_wandb
def delete_old_wandb_ckpts():
    """GC artifact versions without aliases (everything but 'latest';
    reference utils/wandb.py:80-93)."""
    try:
        api_run = _backend.Api().run(_backend.run.path)
        for artifact in api_run.logged_artifacts():
            if len(artifact.aliases) == 0:
                artifact.delete()
                logging.info(
                    "Marked checkpoint %s for deletion on wandb.",
                    artifact.metadata.get("name"),
                )
    except _backend.CommError as exception:
        logging.debug("Wandb raised exception %s", exception)
        logging.warning("Unable to delete checkpoints on wandb.")
