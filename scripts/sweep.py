"""Run a wandb-style sweep config without a wandb server.

The reference launches sweeps with `wandb sweep conf/sweeps/xyz.yaml` plus
wandb agents pulling configurations from the server
(/root/reference/conf/sweeps/exp_repr.yaml, bin/slurm_sweep.sh). Offline,
this script expands a `method: grid` sweep into hydra-style multirun
overrides and executes them through scripts/main.py's launcher machinery
(sequential by default; `launcher=joblib` / `launcher=slurm` for parallel
or cluster execution):

    python scripts/sweep.py conf/sweeps/exp_repr.yaml [extra overrides...]

Extra overrides are appended to every job (e.g. `train_steps=100
launcher=joblib`).
"""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import yaml

REPO_ROOT = Path(__file__).resolve().parents[1]


def _load_main():
    """Import scripts/main.py as a module (scripts/ is not a package)."""
    if "sde_sampler_main" in sys.modules:
        return sys.modules["sde_sampler_main"]
    spec = importlib.util.spec_from_file_location(
        "sde_sampler_main", REPO_ROOT / "scripts" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sde_sampler_main"] = mod
    spec.loader.exec_module(mod)
    return mod


def sweep_overrides(sweep_cfg: dict) -> list[str]:
    """Turn a wandb grid-sweep `parameters` block into multirun overrides."""
    method = sweep_cfg.get("method", "grid")
    if method != "grid":
        raise ValueError(
            f"only method: grid sweeps are supported offline, got {method!r}"
        )
    overrides = []
    for key, spec in (sweep_cfg.get("parameters") or {}).items():
        if "values" in spec:
            values = spec["values"]
        elif "value" in spec:
            values = [spec["value"]]
        else:
            raise ValueError(f"parameter {key!r} needs `values` or `value`")
        split = _load_main()._split_choices
        for v in values:
            # values are joined with commas for the multirun grammar, which
            # splits on top-level commas only — validate with THE splitter
            # main.py uses, so a value the expander would re-split into
            # bogus jobs is rejected up front (single grammar, no drift)
            if len(split(str(v))) > 1:
                raise ValueError(
                    f"value {v!r} for {key!r} contains a top-level "
                    "comma; wrap it in [...] or quote it differently"
                )
        overrides.append(f"{key}=" + ",".join(str(v) for v in values))
    return overrides


def main(argv: list[str] | None = None) -> list[int]:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        raise SystemExit("usage: sweep.py <sweep.yaml> [extra overrides...]")
    sweep_file, extra = argv[0], argv[1:]
    with open(sweep_file) as f:
        sweep_cfg = yaml.safe_load(f)

    mod = _load_main()
    return mod.main(["-m", *sweep_overrides(sweep_cfg), *extra])


if __name__ == "__main__":
    main()
