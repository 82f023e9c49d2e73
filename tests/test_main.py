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
