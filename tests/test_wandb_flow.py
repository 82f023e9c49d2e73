"""Wandb artifact/resume flow against the fake backend (tests/fake_wandb.py).

Covers the reference behaviors stubbed out in round 1: run-id = SHA-256 of
out_dir (reference scripts/main.py:49-53), resume-config merge
(utils/wandb.py:45-51), checkpoint artifact upload/restore/GC
(utils/wandb.py:54-93), and the full preemption-resume path: a requeued job
with a wiped local disk restores its checkpoint from the artifact store and
continues training.
"""
import importlib.util
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(REPO_ROOT / "tests"))

import fake_wandb  # noqa: E402

from sde_sampler_tpu.utils import wandb as wandb_shim  # noqa: E402


def load_main():
    spec = importlib.util.spec_from_file_location(
        "main", REPO_ROOT / "scripts" / "main.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["main"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fake_backend():
    fake_wandb.reset()
    wandb_shim.use_backend(fake_wandb)
    yield fake_wandb
    wandb_shim.use_backend(None)


def test_run_id_is_dir_hash():
    a = wandb_shim.run_id_for_dir("/tmp/some/dir")
    b = wandb_shim.run_id_for_dir("/tmp/some/dir")
    c = wandb_shim.run_id_for_dir("/tmp/other/dir")
    assert a == b and a != c and len(a) == 64


def test_merge_wandb_cfg_current_overrides_win(fake_backend):
    fake_backend.init(id="x", config={"a": 1, "nest": {"p": 1, "q": 2}})
    merged = wandb_shim.merge_wandb_cfg({"a": 5, "nest": {"p": 7}, "new": 3})
    assert merged == {"a": 5, "nest": {"p": 7, "q": 2}, "new": 3}


def test_upload_restore_gc(fake_backend, tmp_path):
    fake_backend.init(id="run1", config={})
    src = tmp_path / "ckpt_a.pkl"
    src.write_bytes(b"payload-a")
    wandb_shim.upload_ckpt(src, name=src.name)
    src2 = tmp_path / "ckpt_b.pkl"
    src2.write_bytes(b"payload-b")
    wandb_shim.upload_ckpt(src2, name=src2.name)

    # restore pulls only the latest version, into out_dir/ckpt/
    out = tmp_path / "restore"
    wandb_shim.restore_ckpt(out)
    restored = list(out.rglob("*.pkl"))
    assert [p.name for p in restored] == ["ckpt_b.pkl"]
    assert restored[0].read_bytes() == b"payload-b"

    # GC deletes alias-less (non-latest) versions
    wandb_shim.delete_old_wandb_ckpts()
    alive = fake_backend.Api().run(fake_backend.run.path).logged_artifacts()
    assert len(alive) == 1 and "latest" in alive[0].aliases


def test_check_wandb_noop_without_run(fake_backend, caplog):
    fake_backend.finish()
    assert wandb_shim.merge_wandb_cfg({"a": 1}) is None  # guarded, no raise


def _run_job(main, out_dir, train_steps):
    return main.main(
        [
            "target=dw_shift",
            "solver=basic_dis",
            "loss.method=lv",
            f"train_steps={train_steps}",
            "train_batch_size=8",
            "train_timesteps.steps=4",
            "eval_batch_size=16",
            "eval_init=False",
            "plot_results=False",
            "ckpt_interval=2",
            "upload_ckpt_to_wandb=True",
            f"out_dir={out_dir}",
        ]
    )


def test_preemption_resume_via_artifacts(fake_backend, tmp_path):
    """Job trains 4 steps (uploading ckpts), the node dies (local disk
    wiped), the requeued job re-inits the same run id, restores the latest
    ckpt artifact, and continues to 8 steps."""
    main = load_main()
    out_dir = tmp_path / "job"

    _run_job(main, out_dir, train_steps=4)
    first_run_id = wandb_shim.run_id_for_dir(out_dir)
    assert fake_backend._server.artifacts.get(first_run_id), "no ckpt uploaded"

    # preemption: lose the local working dir entirely
    import shutil

    shutil.rmtree(out_dir)

    _run_job(main, out_dir, train_steps=8)
    # the requeued job resumed the same run and continued from step 4:
    # metrics.jsonl of the new dir starts beyond step 4
    import json

    lines = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_steps_logged = [
        m["train/step"] for m in lines if "train/step" in m
    ]
    assert train_steps_logged and min(train_steps_logged) > 4
    assert max(train_steps_logged) == 8
