"""Gradient-level oracles: KL and LV gradients vanish at the optimum;
checkpoint resume reproduces uninterrupted training exactly."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_tpu.distr.gauss import IsotropicGauss
from sde_sampler_tpu.eq.sdes import VP
from sde_sampler_tpu.losses.oc import TimeReversalLoss
from sde_sampler_tpu.utils.common import get_timesteps
from sde_sampler_tpu.utils.config import compose, locate

CONF = Path(__file__).parents[1] / "conf"
LOG_Z = 1.7


def make_problem():
    prior = IsotropicGauss(dim=2, loc=0.0, scale=1.0)
    target = IsotropicGauss(dim=2, loc=0.0, scale=1.0, log_norm_const=LOG_Z)
    sde = VP(
        diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0,
        scale_diff_coeff=1.0, terminal_t=1.0, generative=True,
    )
    return prior, target, sde


@pytest.mark.parametrize("method", ["kl", "lv"])
def test_gradient_vanishes_at_optimum(method):
    """u_theta = (1+theta)·u*: d loss/d theta ≈ 0 at theta=0 for KL and LV."""
    prior, target, sde = make_problem()
    ts = get_timesteps(0.0, 1.0, steps=400)
    x0 = prior.sample(jax.random.PRNGKey(0), (8192,))

    def loss_at(theta):
        ctrl = lambda t, x: -(1.0 + theta) * sde.diff_coeff_t(t) * x
        loss = TimeReversalLoss(generative_ctrl=ctrl, sde=sde, method=method)
        val, _ = loss(
            jax.random.PRNGKey(1), ts, x0,
            target.unnorm_log_prob, prior.log_prob,
        )
        return val

    grad = float(jax.grad(loss_at)(0.0))
    # Away from the optimum the gradient is O(1) (lv: 4.38 at theta=0.5);
    # at the optimum it is O(discretization + MC noise), whose REALIZED
    # value depends on the RNG stream (the fast-path default flips
    # noise_pregen, which draws the same distribution from a different
    # stream: lv moved 0.072 -> 0.1507 at 8192 samples). The bound must
    # hold for any stream, so it is sized to the noise scale, not to one
    # realization; the ratio assertion carries the discrimination (29x).
    grad_off = float(jax.grad(loss_at)(0.5))
    assert abs(grad) < 0.25, f"{method}: grad at optimum {grad}"
    assert abs(grad_off) > 5 * abs(grad)


def test_resume_equivalence(tmp_path):
    """save at step 2 + resume for 2 == uninterrupted 4 steps (bitwise)."""
    base = [
        "solver=basic_dis", "target=dw_shift", "loss.method=lv",
        "train_batch_size=16", "train_timesteps.steps=8",
        "eval_batch_size=16", "eval_interval=1000", "eval_init=False",
        "plot_results=False", "store_last_ckpt=False", "~eval_sample_losses",
    ]

    def build(sub, steps):
        cfg = compose(
            CONF, "base",
            base + [f"train_steps={steps}", f"out_dir={tmp_path / sub}"],
        )
        return locate(cfg["solver"]["_target_"])(cfg)

    s_full = build("full", 4)
    for _ in range(4):
        s_full.step()

    s_a = build("resume", 4)
    for _ in range(2):
        s_a.step()
    s_a.store_checkpoint()

    s_b = build("resume", 4)
    s_b.load_checkpoint()
    assert s_b.n_steps == 2
    for _ in range(2):
        s_b.step()

    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.train_state.params),
        jax.tree_util.tree_leaves(s_b.train_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
