"""Multirun launchers: parallel process-pool execution of multirun jobs.

The reference parallelizes multirun sweeps with hydra's joblib launcher plus
a `get_free_gpu` resolver that pins each job to the least-used GPU
(/root/reference/conf/launcher/joblib.yaml,
/root/reference/sde_sampler/utils/hydra.py:15-38). The TPU-native
equivalent: each job runs `python scripts/main.py <overrides>` in its own
process, and per-slot environment overlays play the role of GPU picking
(e.g. pinning jobs to TPU slices via TPU_VISIBLE_CHIPS / forcing jobs onto
the CPU backend for sweep smoke tests).
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]


class SequentialLauncher:
    """In-process sequential execution (the default multirun behavior)."""

    def run(self, jobs: list[list[str]], main_fn) -> list:
        results = []
        for i, job in enumerate(jobs):
            logging.info("[multirun %d/%d] %s", i + 1, len(jobs), " ".join(job))
            results.append(main_fn(job))
        return results


class ProcessPoolLauncher:
    """Run multirun jobs as parallel `scripts/main.py` subprocesses.

    Args:
        n_jobs: maximum concurrent jobs.
        env: environment overlay applied to every job (e.g.
            ``{"JAX_PLATFORMS": "cpu"}`` for CPU sweeps).
        slot_env: list of per-slot overlays cycled by job index — the
            `get_free_gpu` analogue (e.g. one TPU slice spec per slot).
        clean_pythonpath: drop PYTHONPATH in the children (detaches them
            from sitecustomize-based device tunnels).
    """

    def __init__(
        self,
        n_jobs: int = 4,
        env: dict | None = None,
        slot_env: list[dict] | None = None,
        clean_pythonpath: bool = False,
        **kwargs,
    ):
        self.n_jobs = int(n_jobs)
        self.env = {k: str(v) for k, v in (env or {}).items()}
        self.slot_env = [
            {k: str(v) for k, v in overlay.items()}
            for overlay in (slot_env or [])
        ]
        self.clean_pythonpath = clean_pythonpath

    def _job_env(self, idx: int) -> dict:
        env = os.environ.copy()
        if self.clean_pythonpath:
            env.pop("PYTHONPATH", None)
        env.update(self.env)
        if self.slot_env:
            env.update(self.slot_env[idx % len(self.slot_env)])
        return env

    def _run_one(self, idx: int, job: list[str]) -> int:
        cmd = [sys.executable, str(REPO_ROOT / "scripts" / "main.py"), *job]
        logging.info("[multirun job %d] %s", idx, " ".join(job))
        start = time.time()
        proc = subprocess.run(cmd, env=self._job_env(idx))
        logging.info(
            "[multirun job %d] rc=%d (%.1fs)", idx, proc.returncode,
            time.time() - start,
        )
        return proc.returncode

    def run(self, jobs: list[list[str]], main_fn=None) -> list[int]:
        # Threads only marshal subprocesses; the parallelism is processes.
        with ThreadPoolExecutor(max_workers=self.n_jobs) as pool:
            futures = [
                pool.submit(self._run_one, i, job)
                for i, job in enumerate(jobs)
            ]
            codes = [f.result() for f in futures]
        failed = [i for i, c in enumerate(codes) if c != 0]
        if failed:
            logging.error("multirun jobs failed: %s", failed)
        return codes


class SlurmLauncher:
    """Submitit-style Slurm launcher (reference conf/launcher/slurm.yaml).

    Writes one sbatch script per multirun job and submits it with `sbatch`.
    `--requeue` + the wandb run-id-from-out-dir scheme (utils/wandb.py)
    reproduce the reference's preemption-resume flow: a requeued job gets
    the same run id and restores the latest checkpoint. When `sbatch` is
    not on PATH (or submit=False) the scripts are still written under
    `sbatch_dir`, so the launcher is inspectable and testable off-cluster.
    """

    def __init__(
        self,
        nodes: int = 1,
        cpus_per_task: int = 2,
        timeout_min: int = 4320,
        partition: str | None = None,
        qos: str | None = None,
        constraint: str | None = None,
        gres: str | None = None,
        max_num_timeout: int = 3,
        submit: bool | None = None,
        sbatch_dir: str | None = None,
        env: dict | None = None,
        **kwargs,
    ):
        self.nodes = int(nodes)
        self.cpus_per_task = int(cpus_per_task)
        self.timeout_min = int(timeout_min)
        self.partition = partition
        self.qos = qos
        self.constraint = constraint
        self.gres = gres
        self.max_num_timeout = int(max_num_timeout)
        self.submit = submit
        self.sbatch_dir = sbatch_dir
        self.env = {k: str(v) for k, v in (env or {}).items()}

    def _script(self, idx: int, job: list[str], out_dir: Path) -> str:
        import shlex

        lines = [
            "#!/bin/bash",
            f"#SBATCH --job-name=sde_sampler_{idx}",
            f"#SBATCH --nodes={self.nodes}",
            # one training process regardless of nodes (the job itself is
            # single-process; nodes>1 only reserves them, submitit-style)
            "#SBATCH --ntasks=1",
            f"#SBATCH --cpus-per-task={self.cpus_per_task}",
            f"#SBATCH --time={self.timeout_min}",
            f"#SBATCH --output={out_dir}/slurm_%j.out",
            "#SBATCH --open-mode=append",
            "#SBATCH --requeue",
        ]
        for flag, value in (
            ("partition", self.partition),
            ("qos", self.qos),
            ("constraint", self.constraint),
            ("gres", self.gres),
        ):
            if value:
                lines.append(f"#SBATCH --{flag}={value}")
        lines.append("")
        # submitit enforces max_num_timeout client-side; here the script
        # stops requeueing itself once SLURM_RESTART_COUNT exceeds it.
        lines.append(
            f"if [ \"${{SLURM_RESTART_COUNT:-0}}\" -gt "
            f"{self.max_num_timeout} ]; then\n"
            f"  echo 'max_num_timeout ({self.max_num_timeout}) exceeded'; "
            f"exit 1\nfi"
        )
        for key, value in self.env.items():
            lines.append(f"export {key}={shlex.quote(str(value))}")
        quoted = " ".join(shlex.quote(o) for o in job)
        lines.append(
            f"srun {shlex.quote(sys.executable)} "
            f"{shlex.quote(str(REPO_ROOT / 'scripts' / 'main.py'))} {quoted}"
        )
        return "\n".join(lines) + "\n"

    def run(self, jobs: list[list[str]], main_fn=None) -> list[int]:
        import shutil

        sbatch_dir = Path(self.sbatch_dir or Path.cwd() / "sbatch")
        sbatch_dir.mkdir(parents=True, exist_ok=True)
        submit = self.submit
        if submit is None:
            submit = shutil.which("sbatch") is not None
        codes = []
        for i, job in enumerate(jobs):
            out_dir = sbatch_dir / f"job_{i}"
            out_dir.mkdir(parents=True, exist_ok=True)
            script = sbatch_dir / f"job_{i}.sh"
            script.write_text(self._script(i, job, out_dir))
            if submit:
                proc = subprocess.run(
                    ["sbatch", str(script)], capture_output=True, text=True
                )
                logging.info(
                    "[multirun job %d] sbatch rc=%d %s",
                    i, proc.returncode, proc.stdout.strip(),
                )
                codes.append(proc.returncode)
            else:
                logging.info(
                    "[multirun job %d] wrote %s (sbatch unavailable)",
                    i, script,
                )
                codes.append(0)
        return codes
