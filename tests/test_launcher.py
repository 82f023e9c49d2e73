"""Parallel multirun launcher test: two jobs as concurrent subprocesses."""
import importlib.util
import re
import sys
from datetime import datetime
from pathlib import Path

REPO_ROOT = Path(__file__).parents[1]

_TS_RE = re.compile(r"^\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})")


def load_main():
    spec = importlib.util.spec_from_file_location(
        "main", REPO_ROOT / "scripts" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["main"] = mod
    spec.loader.exec_module(mod)
    return mod


def _log_span(path: Path):
    lines = path.read_text().splitlines()
    stamps = [
        datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S")
        for line in lines
        if (m := _TS_RE.match(line))
    ]
    return min(stamps), max(stamps)


def test_process_pool_multirun_overlaps(tmp_path):
    main = load_main()
    codes = main.main(
        [
            "-m",
            "target=dw_shift",
            "solver=basic_dis",
            "seed=1,2",
            "train_steps=2",
            "train_batch_size=8",
            "train_timesteps.steps=4",
            "eval_batch_size=16",
            "eval_init=False",
            "plot_results=False",
            "launcher=joblib",
            "launcher.n_jobs=2",
            "launcher.env.JAX_PLATFORMS=cpu",
            "launcher.clean_pythonpath=True",
            f"out_dir={tmp_path}",
        ]
    )
    assert codes == [0, 0]
    spans = []
    for i in range(2):
        job_dir = tmp_path / f"job{i}"
        assert (job_dir / "metrics.jsonl").exists(), f"job{i} produced no metrics"
        spans.append(_log_span(job_dir / "main.log"))
    # parallel execution: job1 starts before job0 finishes
    assert spans[1][0] < spans[0][1], (
        f"jobs did not overlap: {spans}"
    )


def test_multirun_failure_propagates(tmp_path):
    """A failed job in a subprocess-launcher sweep must fail the sweep
    (exit code surfaces as SystemExit, not a silent rc list)."""
    import pytest

    main = load_main()
    with pytest.raises(SystemExit, match="jobs failed"):
        main.main(
            [
                "-m",
                "target=dw_shift",
                "solver=basic_dis",
                "seed=1,2",
                "train_steps=2",
                "loss.method=bogus_method",
                "launcher=joblib",
                "launcher.n_jobs=2",
                "launcher.env.JAX_PLATFORMS=cpu",
                "launcher.clean_pythonpath=True",
                f"out_dir={tmp_path}",
            ]
        )


def test_slurm_launcher_writes_sbatch_scripts(tmp_path):
    """launcher=slurm generates submittable sbatch scripts per multirun job
    (submit auto-disables off-cluster; reference conf/launcher/slurm.yaml)."""
    main = load_main()
    codes = main.main(
        [
            "-m",
            "target=dw_shift",
            "solver=basic_dis",
            "seed=1,2",
            "train_steps=2",
            "launcher=slurm",
            "launcher.partition=tpu",
            f"launcher.sbatch_dir={tmp_path}/sbatch",
            "+launcher.env.JAX_PLATFORMS=cpu",
            f"out_dir={tmp_path}",
        ]
    )
    assert codes == [0, 0]
    for i in range(2):
        script = (tmp_path / "sbatch" / f"job_{i}.sh").read_text()
        assert "#SBATCH --requeue" in script
        assert "#SBATCH --partition=tpu" in script
        assert "#SBATCH --time=4320" in script
        assert "export JAX_PLATFORMS=cpu" in script
        assert f"seed={1 + i}" in script
        assert "scripts/main.py" in script


def test_sweep_script_expands_grid(tmp_path):
    """scripts/sweep.py turns a wandb-style grid sweep into multirun jobs."""
    import importlib.util

    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(
        "method: grid\n"
        "parameters:\n"
        "  seed:\n"
        "    values: [1, 2]\n"
        "  target:\n"
        "    value: dw_shift\n"
    )
    spec = importlib.util.spec_from_file_location(
        "sweep", REPO_ROOT / "scripts" / "sweep.py"
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    codes = sweep.main(
        [
            str(sweep_yaml),
            "solver=basic_dis",
            "train_steps=2",
            "train_batch_size=8",
            "train_timesteps.steps=4",
            "eval_batch_size=16",
            "eval_init=False",
            "plot_results=False",
            f"out_dir={tmp_path}/out",
        ]
    )
    assert len(codes) == 2
    for i in range(2):
        assert (tmp_path / "out" / f"job{i}" / "metrics.jsonl").exists()
