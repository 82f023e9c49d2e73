"""Entry-point tests: CLI end-to-end run and multirun expansion."""
import importlib.util
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).parents[1]


def load_main():
    spec = importlib.util.spec_from_file_location(
        "main", REPO_ROOT / "scripts" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["main"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_multirun_expansion():
    main = load_main()
    jobs = main._expand_multirun(
        ["solver=dis,pis", "loss.method=kl,lv", "seed=1"]
    )
    assert len(jobs) == 4
    assert ["solver=dis", "loss.method=kl", "seed=1"] in jobs
    assert ["solver=pis", "loss.method=lv", "seed=1"] in jobs


def test_cli_end_to_end(tmp_path):
    main = load_main()
    results = main.main(
        [
            "target=dw_shift",
            "solver=basic_dis",
            "loss.method=lv",
            "train_steps=2",
            "train_batch_size=8",
            "train_timesteps.steps=4",
            "eval_batch_size=16",
            "eval_init=False",
            "plot_results=False",
            "~eval_sample_losses",
            f"out_dir={tmp_path}",
        ]
    )
    assert results.samples is not None
    # artifacts written
    assert (tmp_path / "config.yaml").exists()
    metrics_file = tmp_path / "metrics.jsonl"
    assert metrics_file.exists()
    lines = [json.loads(l) for l in metrics_file.open()]
    assert any("eval/log_norm_const_is" in l for l in lines)
    # checkpoint stored (store_last_ckpt defaults True)
    assert list((tmp_path / "ckpt").glob("ckpt*.pkl"))


def load_collect():
    spec = importlib.util.spec_from_file_location(
        "collect_results", REPO_ROOT / "scripts" / "collect_results.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["collect_results"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_lb_ito_finite_fallback_convention(tmp_path):
    """Grid table: a -inf unfiltered LB-Ito cell publishes the
    finite-filtered error marked '*' (+footnote); finite cells and cells
    without fallback data are untouched (RESULTS.md round-4 convention)."""
    cr = load_collect()

    # finite primary: untouched, no star
    assert cr.lb_ito_cell({"error/log_norm_const_lb_ito": 0.25}, "gmm_x") \
        == "0.2500"
    # -inf primary + logged finite error -> starred fallback
    cell = cr.lb_ito_cell(
        {"error/log_norm_const_lb_ito": float("inf"),
         "error/log_norm_const_lb_ito_finite": 0.43}, "funnel_x",
    )
    assert cell == "0.4300\\*"
    # legacy run (finite error never logged): recovered from the eval
    # value via the known-logZ map for funnel (logZ = 0)
    cell = cr.lb_ito_cell(
        {"error/log_norm_const_lb_ito": float("inf"),
         "eval/log_norm_const_lb_ito_finite": -0.31}, "funnel_y",
    )
    assert cell == "0.3100\\*"
    # unknown target + no fallback data -> keeps the honest inf
    cell = cr.lb_ito_cell(
        {"error/log_norm_const_lb_ito": float("inf")}, "cox_y",
    )
    assert cell == "inf"

    # end-to-end: the footnote appears only when a fallback fired
    run = tmp_path / "funnel_cell"
    run.mkdir()
    (run / "metrics.jsonl").write_text(json.dumps({
        "error/log_norm_const_is": 0.01,
        "error/log_norm_const_lb_ito": float("inf"),
        "error/log_norm_const_lb_ito_finite": 0.5,
    }) + "\n")
    out = cr.table(str(tmp_path))
    assert "0.5000\\*" in out and "finite-filtered" in out
