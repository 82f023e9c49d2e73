"""Experiment entry point.

Usage mirrors the reference (`/root/reference/scripts/main.py`, hydra CLI):

    python scripts/main.py target=dw_shift solver=basic_dis loss.method=lv

Config groups live in `conf/` with the same group/option names as the
reference; overrides use the same grammar (group=option, key.sub=value,
+key=value, ~key). Outputs (metrics.jsonl, PNGs, checkpoints, resolved
config) are written to logs/<date>/<time> or `out_dir=...`.
"""
from __future__ import annotations

import datetime
import logging
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# Make the CPU backend available next to the TPU: all setup-time math runs
# on host (see sde_sampler_tpu/utils/device.py). Must precede jax import.
from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import yaml  # noqa: E402

from sde_sampler_tpu.utils import wandb as wandb_shim  # noqa: E402
from sde_sampler_tpu.utils.config import compose, locate  # noqa: E402


def _split_choices(values: str) -> list[str]:
    """Split on top-level commas only (commas inside [...]/{...} are part
    of a single value, matching hydra's sweep grammar)."""
    parts, depth, cur = [], 0, []
    for ch in values:
        if ch in "[{(":
            depth += 1
        elif ch in "]})":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _expand_multirun(overrides: list[str]) -> list[list[str]]:
    """Cartesian product over comma-separated override values (hydra -m)."""
    import itertools

    choices = []
    for ov in overrides:
        parts = _split_choices(ov.split("=", 1)[1]) if "=" in ov else []
        if len(parts) > 1:
            key = ov.partition("=")[0]
            choices.append([f"{key}={v}" for v in parts])
        else:
            choices.append([ov])
    return [list(combo) for combo in itertools.product(*choices)]


def main(argv: list[str] | None = None):
    overrides = list(argv if argv is not None else sys.argv[1:])

    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in overrides:
            overrides.remove(flag)
            multirun = True
    if multirun:
        jobs = _expand_multirun(overrides)
        # Every job gets an explicit, stable out_dir: derived from the
        # user's out_dir= when given, else a timestamped multirun root
        # fixed HERE (not per-process) so requeued/parallel jobs never
        # race to a fresh timestamp (wandb run ids hash the out_dir).
        now = datetime.datetime.now()
        default_root = (
            REPO_ROOT / "logs" / "multirun" / now.strftime("%Y-%m-%d")
            / now.strftime("%H-%M-%S")
        )
        jobs = [
            [
                f"out_dir={ov.split('=', 1)[1]}/job{i}"
                if ov.startswith("out_dir=") else ov
                for ov in job
            ]
            + (
                [] if any(ov.startswith("out_dir=") for ov in job)
                else [f"out_dir={default_root}/job{i}"]
            )
            + [f"+job_id={i}"]
            for i, job in enumerate(jobs)
        ]
        # Launcher selection (conf/launcher/*; e.g. launcher=joblib runs
        # jobs as a parallel process pool). Composed from job 0's config.
        cfg0 = compose(REPO_ROOT / "conf", "base", jobs[0])
        launcher_cfg = cfg0.get("launcher")
        if launcher_cfg:
            from sde_sampler_tpu.utils.config import instantiate

            launcher = instantiate(launcher_cfg)
        else:
            from sde_sampler_tpu.utils.launcher import SequentialLauncher

            launcher = SequentialLauncher()
        results = launcher.run(jobs, main)
        # Subprocess launchers return per-job exit codes; a failed job must
        # fail the sweep (the sequential launcher raises in-process instead).
        failed = [
            i for i, rc in enumerate(results)
            if isinstance(rc, int) and rc != 0
        ]
        if failed:
            raise SystemExit(
                f"multirun: {len(failed)}/{len(results)} jobs failed "
                f"(indices {failed})"
            )
        return results

    cfg = compose(REPO_ROOT / "conf", "base", overrides)

    # Output directory
    if cfg.get("out_dir"):
        out_dir = Path(cfg["out_dir"])
    else:
        now = datetime.datetime.now()
        out_dir = REPO_ROOT / "logs" / now.strftime("%Y-%m-%d") / now.strftime(
            "%H-%M-%S"
        )
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg["out_dir"] = str(out_dir)

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s][%(levelname)s] %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(out_dir / "main.log"),
        ],
        force=True,
    )
    logging.info("Env: JAX_PLATFORMS=%s", os.environ.get("JAX_PLATFORMS"))
    logging.info("Output directory: %s", out_dir)

    with open(out_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

    wandb_cfg = cfg.get("wandb") or {}
    if wandb_cfg.get("mode") != "disabled":
        # Run id = SHA-256 of the output dir so a requeued (preempted) job
        # resumes the same wandb run (reference scripts/main.py:49-53).
        run_id = wandb_cfg.get("id") or wandb_shim.run_id_for_dir(out_dir)
        tags = wandb_cfg.get("tags") or [t for t in overrides if len(t) < 32]
        wandb_shim.init(
            project=wandb_cfg.get("project"),
            name=wandb_cfg.get("name"),
            tags=tags,
            id=run_id,
            resume="allow",
            mode=wandb_cfg.get("mode", "run"),
            dir=str(out_dir),
            config=dict(cfg),
        )
        # Resumed run: merge the stored config back (current cfg wins;
        # reference scripts/main.py:69-73).
        if getattr(wandb_shim.run, "resumed", False) and cfg.get(
            "merge_wandb_resume_cfg"
        ):
            cfg = wandb_shim.merge_wandb_cfg(cfg) or cfg

    try:
        solver_cls = locate(cfg["solver"]["_target_"])
        solver = solver_cls(cfg)
        solver.setup()
        results = solver()
        wandb_shim.summary_update({"error": None})
        wandb_shim.finish()
        return results
    except Exception as e:
        logging.exception("Run failed")
        wandb_shim.summary_update({"error": str(e)})
        wandb_shim.finish(exit_code=1)
        raise


if __name__ == "__main__":
    main()
