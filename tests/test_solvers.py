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
