"""two_phase=True must reproduce the scan-path lv loss AND its gradient.

The two-phase restructure (phase 1: value-only rollout; phase 2: one
batched control evaluation over all (T, B) states) uses the same states,
noise, and formulas as the noise_pregen scan path — loss and grads must
agree to fp-reassociation tolerance. These tests use a hand-parameterized
linear control so gradients are taken through exactly the path the solver
differentiates.
"""
import jax
import jax.numpy as jnp
import pytest

from sde_sampler_tpu.distr.gauss import IsotropicGauss
from sde_sampler_tpu.eq.sdes import ScaledBM
from sde_sampler_tpu.losses.oc import (
    ExponentialIntegratorSDELoss,
    ReferenceSDELoss,
    TimeReversalLoss,
)
from sde_sampler_tpu.utils.common import get_timesteps

from test_losses import make_stationary_problem

PARAMS = {"w": jnp.asarray(0.7), "b": jnp.asarray(0.1)}


def linear_ctrl(params):
    return lambda t, x: params["w"] * x + params["b"] * (1.0 + t)


def assert_loss_and_grad_match(make_loss, call_args_fn, params=PARAMS):
    def loss_with(two_phase):
        def f(p, key):
            loss = make_loss(linear_ctrl(p), two_phase)
            l, _ = loss(key, *call_args_fn())
            return l

        return f

    key = jax.random.PRNGKey(7)
    l_scan, g_scan = jax.jit(
        jax.value_and_grad(loss_with(False))
    )(params, key)
    l_two, g_two = jax.jit(jax.value_and_grad(loss_with(True)))(params, key)
    assert float(l_scan) == pytest.approx(float(l_two), rel=2e-5, abs=1e-6)
    for name in params:
        assert float(g_scan[name]) == pytest.approx(
            float(g_two[name]), rel=2e-4, abs=1e-6
        ), name


def test_time_reversal_lv_two_phase_matches_scan():
    prior, target, sde, _ = make_stationary_problem()
    ts = get_timesteps(0.0, 1.0, steps=50)
    x0 = prior.sample(jax.random.PRNGKey(0), (512,))

    def make_loss(ctrl, two_phase):
        return TimeReversalLoss(
            generative_ctrl=ctrl, sde=sde, method="lv",
            noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, prior.log_prob)
    )


def test_time_reversal_lv_two_phase_with_exploration_noise():
    prior, target, sde, _ = make_stationary_problem()
    ts = get_timesteps(0.0, 1.0, steps=30)
    x0 = prior.sample(jax.random.PRNGKey(0), (256,))

    def make_loss(ctrl, two_phase):
        return TimeReversalLoss(
            generative_ctrl=ctrl, sde=sde, method="lv",
            sde_ctrl_noise=0.2, noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, prior.log_prob)
    )


def test_bridge_inference_ctrl_two_phase_matches_scan():
    prior, target, sde, _ = make_stationary_problem()
    ts = get_timesteps(0.0, 1.0, steps=30)
    x0 = prior.sample(jax.random.PRNGKey(0), (256,))

    def make_loss(ctrl, two_phase):
        return TimeReversalLoss(
            generative_ctrl=ctrl, sde=sde, method="lv",
            inference_ctrl=lambda t, x: -0.4 * x * (1.0 - t),
            noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, prior.log_prob)
    )


def test_reference_sde_lv_two_phase_matches_scan():
    sde = ScaledBM(diff_coeff=1.0, terminal_t=1.0, generative=True)
    target = IsotropicGauss(dim=3, loc=0.0, scale=1.0, log_norm_const=0.3)
    ref_log_prob = IsotropicGauss(dim=3, loc=0.0, scale=1.0).log_prob
    ts = get_timesteps(0.0, 1.0, steps=40)
    x0 = jnp.zeros((256, 3))

    def make_loss(ctrl, two_phase):
        return ReferenceSDELoss(
            generative_ctrl=ctrl, sde=sde, method="lv",
            reference_ctrl=lambda t, x: -0.2 * x,
            noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, ref_log_prob)
    )


def test_exponential_integrator_lv_two_phase_matches_scan():
    sigma = 1.2
    prior = IsotropicGauss(dim=3, loc=0.0, scale=sigma)
    target = IsotropicGauss(dim=3, loc=0.0, scale=1.0, log_norm_const=0.5)
    ts = get_timesteps(0.0, 6.4, dt=0.2, rescale_t="cosine")
    x0 = prior.sample(jax.random.PRNGKey(0), (256,))

    def make_loss(ctrl, two_phase):
        return ExponentialIntegratorSDELoss(
            generative_ctrl=ctrl, method="lv", alpha=0.8, sigma=sigma,
            noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, prior.log_prob)
    )


def test_lv_traj_two_phase_matches_scan():
    prior, target, sde, _ = make_stationary_problem()
    ts = get_timesteps(0.0, 1.0, steps=25)
    x0 = prior.sample(jax.random.PRNGKey(0), (64,))

    def make_loss(ctrl, two_phase):
        return TimeReversalLoss(
            generative_ctrl=ctrl, sde=sde, method="lv_traj",
            traj_per_sample=4, noise_pregen=True, two_phase=two_phase,
        )

    assert_loss_and_grad_match(
        make_loss, lambda: (ts, x0, target.unnorm_log_prob, prior.log_prob)
    )


def test_two_phase_rejects_kl():
    prior, target, sde, ctrl = make_stationary_problem()
    with pytest.raises(ValueError):
        TimeReversalLoss(
            generative_ctrl=ctrl, sde=sde, method="kl", two_phase=True
        )


def test_two_phase_multichip_matches_singlechip(tmp_path):
    """two_phase under a dp mesh: the pregen (T, B, d) draw and the
    batched phase-2 evaluation must shard over the batch and track the
    single-device run (same seed => same draws; only reduction order
    differs)."""
    import numpy as np

    from test_solvers import TINY, build_solver

    base = (
        ["solver=basic_dis", "target=dw_shift", "loss.method=lv",
         "+loss.two_phase=True", "+loss.noise_pregen=True"]
        + TINY
    )

    def losses(n_devices, sub):
        solver = build_solver(
            base + ([f"n_devices={n_devices}"] if n_devices else []),
            tmp_path / sub,
        )
        out = []
        for _ in range(3):
            metrics = solver.step()
            out.append(float(metrics["train/loss"]))
        return out

    l1 = losses(None, "d1")
    l8 = losses(8, "d8")
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)


def test_fast_path_default_resolution(monkeypatch):
    """None-valued fast-path knobs resolve together from FAST_PATH_DEFAULT;
    explicit values always win; kl is never affected."""
    from sde_sampler_tpu.losses import oc

    ctrl = lambda t, x: x  # noqa: E731

    # current production default (flipped ON 2026-08-18 after the
    # REEVAL_DONE A/B gate): lv resolves on, kl stays off
    loss = oc.BaseOCLoss(ctrl, method="lv")
    assert loss.two_phase is True
    assert loss.noise_pregen is True and loss.scan_unroll == 8
    loss = oc.BaseOCLoss(ctrl, method="kl")
    assert loss.two_phase is False
    assert loss.noise_pregen is False and loss.scan_unroll == 1

    # with the default off (simulated): everything resolves off
    monkeypatch.setattr(oc, "FAST_PATH_DEFAULT", False)
    loss = oc.BaseOCLoss(ctrl, method="lv")
    assert loss.two_phase is False
    assert loss.noise_pregen is False and loss.scan_unroll == 1

    # explicit overrides win regardless of the default
    loss = oc.BaseOCLoss(ctrl, method="lv", two_phase=False,
                         scan_unroll=4)
    assert loss.two_phase is False and loss.scan_unroll == 4
    assert loss.noise_pregen is False
    loss = oc.BaseOCLoss(ctrl, method="lv", two_phase=True,
                         noise_pregen=False)
    assert loss.two_phase is True and loss.noise_pregen is False
