"""Solver smoke matrix + sharding equivalence.

Mirrors the reference's de-facto integration tests (bin/slurm_test_solver.sh
runs every solver preset for 2 steps; bin/slurm_test_target.sh runs every
target with tiny batches) as proper pytest cases on the virtual CPU mesh,
plus multi-chip == single-chip checks the reference cannot express.
"""
from pathlib import Path

import jax
import numpy as np
import pytest

from sde_sampler_tpu.utils.config import compose, locate

CONF = Path(__file__).parents[1] / "conf"

TINY = [
    "train_steps=2",
    "train_batch_size=16",
    "train_timesteps.steps=8",
    "eval_batch_size=32",
    "eval_interval=1000",
    "eval_init=False",
    "plot_results=False",
    "store_last_ckpt=False",
    "~eval_sample_losses",  # skip sinkhorn in smoke tests
]

SOLVERS = [
    "basic_dis",
    "basic_pis",
    "basic_dds",
    "basic_dds_euler",
    "basic_bridge",
    "basic_bridge_subtraj",
    "basic_dis_subtraj",
    "dis",
    "dis_no_score",
    "pis",
    "pis_no_score",
    "dds",
    "dds_euler",
    "bridge",
    "bridge_diff_init",
    "dis_subtraj",
    "bridge_subtraj",
]


def build_solver(overrides, tmp_path):
    cfg = compose(CONF, "base", overrides + [f"out_dir={tmp_path}"])
    return locate(cfg["solver"]["_target_"])(cfg)


@pytest.mark.parametrize("solver_name", SOLVERS)
def test_solver_smoke(solver_name, tmp_path):
    overrides = [f"solver={solver_name}", "target=dw_shift"] + TINY
    if "dds" in solver_name and "euler" not in solver_name:
        # cosine grids use dt, not steps
        overrides = [
            o for o in overrides if not o.startswith("train_timesteps")
        ] + ["train_timesteps.dt=0.8"]
    solver = build_solver(overrides, tmp_path)
    solver.target.compute_stats(solver.next_key())
    results = solver.run()
    assert results.samples is not None
    assert bool(np.isfinite(np.asarray(results.samples)).all())
    for name, value in results.log_norm_const_preds.items():
        assert np.isfinite(value), name


def test_langevin_smoke(tmp_path):
    overrides = [
        "solver=langevin",
        "target=dw_shift",
        "eval_batch_size=64",
        "eval_timesteps.steps=50",
        "eval_expectation_burn=10",
        "plot_results=False",
        "store_last_ckpt=False",
        "~eval_sample_losses",
    ]
    solver = build_solver(overrides, tmp_path)
    solver.target.compute_stats(solver.next_key())
    results = solver.run()
    assert results.samples.shape == (64, 1)
    assert np.isfinite(results.expectation_preds["square"])


def test_multichip_matches_singlechip(tmp_path):
    """Data-parallel sharded training must track the single-device run."""
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    base = ["solver=basic_dis", "target=dw_shift"] + TINY

    def losses(n_devices):
        solver = build_solver(
            base + ([f"n_devices={n_devices}"] if n_devices else []),
            tmp_path / f"d{n_devices}",
        )
        out = []
        for _ in range(3):
            metrics = solver.step()
            out.append(float(metrics["train/loss"]))
        return out

    l1 = losses(None)  # mesh disabled (single device)
    l8 = losses(8)
    # Same seed => same prior draws and noise; SPMD partitioning only
    # changes reduction order, so results agree to float tolerance.
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    base = ["solver=basic_dis", "target=dw_shift"] + TINY
    solver = build_solver(base + ["train_steps=3"], tmp_path)
    for _ in range(3):
        solver.step()
    solver.store_checkpoint()
    step_before = solver.n_steps
    params_before = jax.tree_util.tree_leaves(solver.train_state.params)

    solver2 = build_solver(base + ["train_steps=3"], tmp_path)
    solver2.load_checkpoint()
    assert solver2.n_steps == step_before
    params_after = jax.tree_util.tree_leaves(solver2.train_state.params)
    for a, b in zip(params_before, params_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", Path(__file__).parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    mod.dryrun_multichip(8)


def test_subtraj_bucket_selection(tmp_path):
    overrides = ["solver=basic_dis_subtraj", "target=dw_shift"] + TINY
    solver = build_solver(overrides, tmp_path)
    n = int(solver.train_ts.shape[0])  # 9 points for 8 steps
    assert solver._bucket_len(2) == 2
    assert solver._bucket_len(3) == 4
    assert solver._bucket_len(5) == 8
    assert solver._bucket_len(n) == n  # capped at the grid size
    solver.bucket_subtraj = False
    assert solver._bucket_len(2) == n


def test_subtraj_bucket_full_window_matches_legacy(tmp_path):
    """bucket_len == grid size reproduces the round-1 clipped-grid
    computation bitwise (same scan length -> same RNG stream)."""
    overrides = ["solver=basic_dis_subtraj", "target=dw_shift"] + TINY
    solver = build_solver(overrides, tmp_path)
    params = solver.train_state.params
    clips = solver.current_clips()
    key = jax.random.PRNGKey(123)
    n = int(solver.train_ts.shape[0])
    idx_init, idx_end = jax.numpy.asarray(2), jax.numpy.asarray(5)
    legacy, _ = solver.compute_subtraj_loss_traced(
        params, key, clips, idx_init, idx_end, bucket_len=None
    )
    full_bucket, _ = solver.compute_subtraj_loss_traced(
        params, key, clips, idx_init, idx_end, bucket_len=n
    )
    assert float(legacy) == float(full_bucket)


def test_subtraj_bucketed_training_steps(tmp_path):
    """Short subtrajectories run on short buckets; training stays finite and
    the jit cache holds one entry per bucket length."""
    overrides = ["solver=basic_dis_subtraj", "target=dw_shift"] + TINY
    solver = build_solver(overrides, tmp_path)
    solver.subtraj_prob = 1.0  # force the subtrajectory path
    for _ in range(6):
        metrics = solver.step()
        assert np.isfinite(float(metrics["train/loss"]))
    assert solver._subtraj_jits, "no bucketed compiles happened"
    n = int(solver.train_ts.shape[0])
    assert all(
        length <= n and (length & (length - 1)) == 0 or length == n
        for length in solver._subtraj_jits
    )


def test_subtraj_step_chunk_keeps_subtraj_path(tmp_path):
    """step_chunk(n) on a subtraj solver must run the per-step host
    randomness (regression: the inherited fused dispatch silently trained
    full trajectories only)."""
    overrides = ["solver=basic_dis_subtraj", "target=dw_shift"] + TINY
    solver = build_solver(overrides, tmp_path)
    solver.subtraj_prob = 1.0
    metrics = solver.step_chunk(4)
    assert solver.n_steps == 4
    assert np.isfinite(float(metrics["train/loss"]))
    assert solver._subtraj_jits, "subtrajectory path never engaged"


def test_results_fresh_mutable_defaults():
    """Results dict fields are per-instance (regression: shared namedtuple
    {} defaults leaked plots/metrics mutations across instances)."""
    from sde_sampler_tpu.utils.common import Results

    a = Results()
    a.plots["stale"] = object()
    a.metrics["x"] = 1.0
    b = Results()
    assert b.plots == {} and b.metrics == {}
    # explicit values pass through untouched
    c = Results(metrics={"y": 2.0})
    assert c.metrics == {"y": 2.0}
    # _replace keeps existing values verbatim
    d = c._replace(ts=None)
    assert d.metrics is c.metrics


def test_partial_param_groups_fall_back_to_default_lr(tmp_path):
    """param_groups listing only SOME top-level param subtrees must not
    crash optimizer init; unlisted subtrees get the default lr."""
    overrides = (
        ["solver=basic_bridge", "target=dw_shift"]
        + TINY
        + ["+param_groups={generative_ctrl: {lr: 0.01}}"]
    )
    solver = build_solver(overrides, tmp_path)
    assert "inference_ctrl" in solver.train_state.params
    metrics = solver.step()
    assert np.isfinite(float(metrics["train/loss"]))


def test_levelnet_drops_bias_under_layernorm():
    """Reference parity: LevelNet embed/inner Linears have no bias when
    normalization is on (reference models/mlp.py:227-233); the final
    projection keeps its bias."""
    import jax.numpy as jnp

    from sde_sampler_tpu.models.mlp import MultilevelNet

    net = MultilevelNet(dim=3, levels=2, use_layernorm=True)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros(()), jnp.zeros((4, 3))
    )["params"]
    level = params["level_1"]
    assert "bias" not in level["dense_0"]
    assert "bias" not in level["dense_1"]  # inner
    assert "bias" in level["dense_2"]  # final projection
    # without layernorm all biases exist (torch-checkpoint import layout)
    net2 = MultilevelNet(dim=3, levels=2, use_layernorm=False)
    params2 = net2.init(
        jax.random.PRNGKey(0), jnp.zeros(()), jnp.zeros((4, 3))
    )["params"]
    assert "bias" in params2["level_1"]["dense_0"]


def test_model_watcher_metrics(tmp_path):
    """model_watcher attaches per-submodule grad norms to step metrics
    (the reference's wandb.watch analogue, conf/utils/model_watcher.yaml)."""
    overrides = (
        ["solver=basic_dis", "target=dw_shift"]
        + TINY
        + ["+utils@model_watcher=model_watcher", "+model_watcher.log=all"]
    )
    solver = build_solver(overrides, tmp_path)
    metrics = solver.step()
    watch_keys = [k for k in metrics if k.startswith("watch/")]
    assert any(k.startswith("watch/grad_norm/") for k in watch_keys)
    assert any(k.startswith("watch/param_norm/") for k in watch_keys)
    for k in watch_keys:
        assert np.isfinite(float(metrics[k])), k
    # thinning: log_freq defaults to eval_interval (1000 in TINY)
    assert solver.model_watcher.should_log(0)
    assert not solver.model_watcher.should_log(1)


def test_langevin_sharded_smoke(tmp_path):
    """ULA baseline shards its chain batch over the dp mesh."""
    overrides = [
        "solver=langevin",
        "target=dw_shift",
        "eval_batch_size=64",
        "eval_timesteps.steps=50",
        "eval_expectation_burn=10",
        "n_devices=8",
        "plot_results=False",
        "store_last_ckpt=False",
        "~eval_sample_losses",
    ]
    solver = build_solver(overrides, tmp_path)
    assert solver.mesh is not None
    solver.target.compute_stats(solver.next_key())
    results = solver.run()
    assert results.samples.shape == (64, 1)
    assert np.isfinite(results.expectation_preds["square"])

