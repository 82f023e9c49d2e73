"""Merge semantics of scripts/collect_results.update_results.

The rendered GRID/SEED table blocks in RESULTS.md are the only durable
record of cells whose raw metrics.jsonl died with a VM reboot (logs/ is
untracked — it was wiped twice on 2026-08-18 alone), so a table refresh
must overlay recomputed rows WITHOUT dropping rows it cannot recompute.
"""
from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
_spec = importlib.util.spec_from_file_location(
    "collect_results", REPO_ROOT / "scripts" / "collect_results.py"
)
collect_results = importlib.util.module_from_spec(_spec)
sys.modules["collect_results"] = collect_results
_spec.loader.exec_module(collect_results)


GRID = """\
| Run | logZ err (IS) | logZ err (LB-Ito) | Sinkhorn | norm. ESS | stddev rel err |
|---|---|---|---|---|---|
| funnel_dis_lv | 0.0257 | 0.4340 | 5.1452 | 0.2328 | 0.5666 |
| funnel_dis_lv_seed3 | 0.0416 | inf | 6.6275 | 0.0681 | 0.6656 |
"""

SEED = """\
| Cell (n seeds) | logZ err (IS) | logZ err (LB-Ito) | Sinkhorn | norm. ESS | stddev rel err |
|---|---|---|---|---|---|
| funnel_dis_lv (3) | 0.0663 ± 0.0571 | 0.4334 ± 8.00e-04 | 5.6528 ± 0.8444 | 0.1008 ± 0.1191 | 0.6099 ± 0.0506 |
"""


def _results_md(tmp_path: Path) -> Path:
    md = tmp_path / "RESULTS.md"
    md.write_text(
        "header\n\n"
        + collect_results.START + "\n" + GRID + collect_results.END
        + "\n\nmiddle\n\n"
        + collect_results.SEED_START + "\n" + SEED + collect_results.SEED_END
        + "\ntail\n"
    )
    return md


def _write_run(root: Path, name: str, metrics: dict) -> None:
    run = root / name
    run.mkdir(parents=True)
    (run / "metrics.jsonl").write_text(json.dumps(metrics) + "\n")


def test_refresh_with_no_roots_is_a_noop(tmp_path):
    md = _results_md(tmp_path)
    before = md.read_text()
    collect_results.update_results([str(tmp_path / "empty")], md)
    assert md.read_text() == before


def test_new_run_overrides_only_its_own_row(tmp_path):
    md = _results_md(tmp_path)
    root = tmp_path / "results"
    _write_run(root, "funnel_dis_lv_seed3", {
        "error/log_norm_const_is": 0.05,
        "error/log_norm_const_lb_ito": 0.41,
        "error/sinkhorn": 6.0,
        "eval/norm_effective_sample_size": 0.07,
        "rel_error/avg_stddev": 0.66,
    })
    collect_results.update_results([str(root)], md)
    text = md.read_text()
    # the old cell whose raw metrics no longer exist survives verbatim
    assert "| funnel_dis_lv | 0.0257 | 0.4340 |" in text
    # the re-run cell's inf row is replaced by the fresh metrics
    assert "inf" not in text
    assert "| funnel_dis_lv_seed3 | 0.0500 | 0.4100 |" in text


def test_filtered_fallback_row_is_starred_and_footnoted(tmp_path):
    md = _results_md(tmp_path)
    root = tmp_path / "results"
    _write_run(root, "funnel_dis_lv_seed3", {
        "error/log_norm_const_is": 0.05,
        "error/log_norm_const_lb_ito": float("inf"),
        "error/log_norm_const_lb_ito_filtered": 0.43,
        "error/sinkhorn": 6.0,
        "eval/norm_effective_sample_size": 0.07,
        "rel_error/avg_stddev": 0.66,
    })
    collect_results.update_results([str(root)], md)
    text = md.read_text()
    assert "| 0.4300\\* |" in text
    assert "finite-filtered LB-Itô" in text


def test_seed_row_with_fewer_replicates_never_regresses(tmp_path):
    md = _results_md(tmp_path)
    root = tmp_path / "results"
    # two fresh replicates < the 3 aggregated in the rendered row
    for seed, err in (("", 0.02), ("_seed2", 0.03)):
        _write_run(root, f"funnel_dis_lv{seed}", {
            "error/log_norm_const_is": err,
            "error/log_norm_const_lb_ito": 0.43,
            "error/sinkhorn": 5.1,
            "eval/norm_effective_sample_size": 0.2,
            "rel_error/avg_stddev": 0.57,
        })
    collect_results.update_results([str(root)], md)
    assert "| funnel_dis_lv (3) | 0.0663 ± 0.0571 |" in md.read_text()


def test_seed_row_with_equal_replicates_is_recomputed(tmp_path):
    md = _results_md(tmp_path)
    root = tmp_path / "results"
    for seed, err in (("", 0.02), ("_seed2", 0.03), ("_seed3", 0.04)):
        _write_run(root, f"funnel_dis_lv{seed}", {
            "error/log_norm_const_is": err,
            "error/log_norm_const_lb_ito": 0.43,
            "error/sinkhorn": 5.1,
            "eval/norm_effective_sample_size": 0.2,
            "rel_error/avg_stddev": 0.57,
        })
    collect_results.update_results([str(root)], md)
    text = md.read_text()
    assert "| funnel_dis_lv (3) | 0.0300 ± 0.0100 |" in text
    assert "0.0663" not in text
