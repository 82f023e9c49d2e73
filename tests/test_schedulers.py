"""EMA, lr-schedule, and MultiStepParams semantics tests."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_tpu.solver.base import EMAConfig, MultiStepLR, StepLR
from sde_sampler_tpu.utils.config import compose, locate

CONF = Path(__file__).parents[1] / "conf"


def test_ema_decay_formula():
    ema = EMAConfig(
        decay=0.9999, update_after_step=10, update_every=1,
        inv_gamma=1.0, power=2 / 3, min_value=0.0,
    )
    # before warmup ends: decay 0 (shadow copies params)
    assert float(ema.current_decay(jnp.asarray(5))) == 0.0
    # after: 1 - (1 + epoch)^-power capped at decay
    n = 20
    epoch = n - 10 - 1
    expected = 1 - (1 + epoch) ** (-2 / 3)
    assert float(ema.current_decay(jnp.asarray(n))) == pytest.approx(
        expected, rel=1e-5
    )
    assert float(ema.current_decay(jnp.asarray(10**9))) == pytest.approx(
        0.9999
    )


def test_ema_update_semantics():
    ema = EMAConfig(update_after_step=2, update_every=1, inv_gamma=1.0,
                    power=2 / 3)
    params = {"w": jnp.asarray(1.0)}
    shadow = {"w": jnp.asarray(0.0)}
    num = jnp.asarray(0, jnp.int32)
    ok = jnp.asarray(True)
    # first two updates: shadow copies params
    for _ in range(2):
        shadow, num = ema.update(shadow, num, params, ok)
    assert float(shadow["w"]) == 1.0
    # later updates: exponential tracking toward new params
    params = {"w": jnp.asarray(2.0)}
    shadow, num = ema.update(shadow, num, params, ok)
    decay = float(ema.current_decay(num))
    assert float(shadow["w"]) == pytest.approx(1.0 + (1 - decay) * 1.0)
    # gated updates don't move the shadow or the counter
    shadow2, num2 = ema.update(shadow, num, params, jnp.asarray(False))
    assert float(shadow2["w"]) == float(shadow["w"])
    assert int(num2) == int(num)


def test_lr_schedules():
    step_lr = StepLR(step_size=100, gamma=0.5)
    assert float(step_lr(0)) == 1.0
    assert float(step_lr(99)) == 1.0
    assert float(step_lr(100)) == 0.5
    assert float(step_lr(250)) == 0.25

    ms = MultiStepLR(milestones=[10, 20], gamma=0.1)
    assert float(ms(5)) == pytest.approx(1.0)
    assert float(ms(15)) == pytest.approx(0.1)
    assert float(ms(25)) == pytest.approx(0.01)


def test_multistep_params_schedules_clips_without_retrace(tmp_path):
    cfg = compose(
        CONF, "base",
        [
            "solver=dis", "target=dw_shift",
            "train_steps=2", "train_batch_size=8",
            "train_timesteps.steps=4", "eval_batch_size=8",
            "eval_interval=1000", "eval_init=False", "plot_results=False",
            "store_last_ckpt=False", "~eval_sample_losses",
            f"out_dir={tmp_path}",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    # dis schedules generative_ctrl clip_{model,score} x5 at steps 200, 400
    assert solver.scheduled_params["generative_ctrl.clip_model"] == 10.0
    sched = solver.scheduler.param_schedulers[0]
    for _ in range(200):
        sched.step()
    assert solver.scheduled_params["generative_ctrl.clip_model"] == 50.0
    for _ in range(200):
        sched.step()
    assert solver.scheduled_params["generative_ctrl.clip_score"] == 250.0

    # changing clips must not retrace the train step
    solver.step()
    if hasattr(solver._train_step, "_cache_size"):
        size_before = solver._train_step._cache_size()
        solver.scheduled_params["generative_ctrl.clip_model"] = 123.0
        solver.step()
        assert solver._train_step._cache_size() == size_before


def test_sde_ctrl_noise_and_dropout(tmp_path):
    cfg = compose(
        CONF, "base",
        [
            "solver=basic_dis", "target=dw_shift", "loss.method=lv",
            "loss.sde_ctrl_noise=0.1", "loss.sde_ctrl_dropout=0.5",
            "train_steps=2", "train_batch_size=8",
            "train_timesteps.steps=4", "eval_batch_size=8",
            "eval_interval=1000", "eval_init=False", "plot_results=False",
            "store_last_ckpt=False", "~eval_sample_losses",
            f"out_dir={tmp_path}",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    for _ in range(2):
        metrics = solver.step()
    assert np.isfinite(float(metrics["train/loss"]))


def test_traj_per_sample_lv_traj(tmp_path):
    cfg = compose(
        CONF, "base",
        [
            "solver=basic_dis", "target=dw_shift",
            "loss.method=lv_traj", "loss.traj_per_sample=4",
            "train_steps=2", "train_batch_size=8",
            "train_timesteps.steps=4", "eval_batch_size=8",
            "eval_interval=1000", "eval_init=False", "plot_results=False",
            "store_last_ckpt=False", "~eval_sample_losses",
            f"out_dir={tmp_path}",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    metrics = solver.step()
    loss = float(metrics["train/loss"])
    assert np.isfinite(loss) and loss >= 0


def test_kl_ito_method(tmp_path):
    cfg = compose(
        CONF, "base",
        [
            "solver=basic_dis", "target=dw_shift", "loss.method=kl_ito",
            "train_steps=2", "train_batch_size=8",
            "train_timesteps.steps=4", "eval_batch_size=8",
            "eval_interval=1000", "eval_init=False", "plot_results=False",
            "store_last_ckpt=False", "~eval_sample_losses",
            f"out_dir={tmp_path}",
        ],
    )
    solver = locate(cfg["solver"]["_target_"])(cfg)
    metrics = solver.step()
    assert np.isfinite(float(metrics["train/loss"]))


def test_step_chunking_matches_sequential(tmp_path):
    base = [
        "solver=basic_dis", "target=dw_shift", "loss.method=lv",
        "train_steps=6", "train_batch_size=8", "train_timesteps.steps=4",
        "eval_batch_size=8", "eval_interval=1000", "eval_init=False",
        "plot_results=False", "store_last_ckpt=False", "~eval_sample_losses",
    ]

    def run(steps_per_call, sub):
        cfg = compose(
            CONF, "base",
            base + [f"steps_per_call={steps_per_call}",
                    f"out_dir={tmp_path / sub}"],
        )
        solver = locate(cfg["solver"]["_target_"])(cfg)
        while solver.n_steps < 6:
            metrics = solver.step_chunk(solver._next_chunk_size())
        return float(metrics["train/loss"]), jax.tree_util.tree_leaves(
            solver.train_state.params
        )

    loss1, params1 = run(1, "a")
    loss3, params3 = run(3, "b")
    assert loss1 == pytest.approx(loss3, rel=1e-5)
    for a, b in zip(params1, params3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
