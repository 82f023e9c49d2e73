"""Loss rollout tests against analytic oracles.

Goes beyond the reference's test suite (which has no loss tests): exact logZ
on Gaussian targets, LV=0 at the analytic optimum, KL estimator lower bound,
divergence estimators, masked reductions, and detach semantics of the
log-variance loss.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_tpu.distr.gauss import IsotropicGauss
from sde_sampler_tpu.eq.sdes import VP, ConstOU, ScaledBM
from sde_sampler_tpu.losses.oc import (
    ExponentialIntegratorSDELoss,
    ReferenceSDELoss,
    TimeReversalLoss,
    divx_exact,
    divx_hutchinson,
    masked_mean,
    masked_var,
)
from sde_sampler_tpu.utils.common import get_timesteps

LOG_Z = 1.7


def make_stationary_problem():
    """VP SDE with unit stationary variance; prior = target = N(0, I)."""
    prior = IsotropicGauss(dim=2, loc=0.0, scale=1.0)
    target = IsotropicGauss(dim=2, loc=0.0, scale=1.0, log_norm_const=LOG_Z)
    sde = VP(
        diff_coeff_sq_min=0.1,
        diff_coeff_sq_max=10.0,
        scale_diff_coeff=1.0,
        terminal_t=1.0,
        generative=True,
    )

    def ctrl_opt(t, x):
        # Exact time-reversal control for the stationary VP process.
        return -sde.diff_coeff_t(t) * x

    return prior, target, sde, ctrl_opt


def test_optimal_control_exact_log_z_and_zero_lv():
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(generative_ctrl=ctrl_opt, sde=sde, method="lv")
    ts = get_timesteps(0.0, 1.0, steps=1000)
    x0 = prior.sample(jax.random.PRNGKey(0), (4096,))
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=False
        )
    )(jax.random.PRNGKey(1), x0)
    stats = loss.compute_results_arrays(res.rnd, res.rnd_no_ito)
    assert float(stats["log_norm_const_is"]) == pytest.approx(LOG_Z, abs=0.05)
    assert float(stats["log_norm_const_lb_ito"]) == pytest.approx(LOG_Z, abs=0.05)
    # The plain LB (no Ito correction) is the noisiest estimator: at 4096
    # samples its MC error is ~0.06, so the realized value depends on the
    # noise stream (FAST_PATH_DEFAULT=True routes lv through noise_pregen,
    # which draws the same distribution in a different order).
    assert float(stats["log_norm_const_lb"]) == pytest.approx(LOG_Z, abs=0.12)
    assert float(stats["lv_loss"]) < 0.1

    l_lv, _ = jax.jit(
        lambda k, x: loss(k, ts, x, target.unnorm_log_prob, prior.log_prob)
    )(jax.random.PRNGKey(2), x0)
    assert float(l_lv) < 0.1


def test_is_estimator_unbiased_under_suboptimal_control():
    prior, target, sde, _ = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=lambda t, x: jnp.zeros_like(x), sde=sde, method="lv"
    )
    ts = get_timesteps(0.0, 1.0, steps=500)
    x0 = prior.sample(jax.random.PRNGKey(0), (16384,))
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=False
        )
    )(jax.random.PRNGKey(1), x0)
    stats = loss.compute_results_arrays(res.rnd, res.rnd_no_ito)
    # IS estimator is unbiased (log-concavity bias shrinks with batch);
    # the lower bounds must be below logZ.
    assert float(stats["log_norm_const_is"]) == pytest.approx(LOG_Z, abs=0.3)
    assert float(stats["log_norm_const_lb_ito"]) < LOG_Z
    assert float(stats["log_norm_const_lb"]) < LOG_Z


def test_kl_loss_at_optimum_matches_analytic_value():
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(generative_ctrl=ctrl_opt, sde=sde, method="kl")
    ts = get_timesteps(0.0, 1.0, steps=1000)
    x0 = prior.sample(jax.random.PRNGKey(0), (8192,))
    l_kl, _ = jax.jit(
        lambda k, x: loss(k, ts, x, target.unnorm_log_prob, prior.log_prob)
    )(jax.random.PRNGKey(1), x0)
    # E[rnd] = E[1/2 int |u*|^2 dt] - E[log rho(X_T)]
    # = int beta(t) dt + (log 2pi + 1) - logZ for the 2-d stationary case
    expected = (10.0 + 0.1) / 2 + (np.log(2 * np.pi) + 1) - LOG_Z
    assert float(l_kl) == pytest.approx(expected, rel=0.02)


def test_reference_sde_loss_zero_at_reference():
    """With ctrl == reference ctrl and target == reference marginal, rnd == -logZ_offset exactly."""
    sde = ScaledBM(diff_coeff=1.0, terminal_t=1.0, generative=True)
    # trajectories start at the origin (Dirac prior); after time 1 the
    # reference marginal is N(0, 1)
    target = IsotropicGauss(dim=2, loc=0.0, scale=1.0, log_norm_const=LOG_Z)
    reference_log_prob = IsotropicGauss(dim=2, loc=0.0, scale=1.0).log_prob
    loss = ReferenceSDELoss(
        generative_ctrl=lambda t, x: jnp.zeros_like(x), sde=sde, method="lv"
    )
    ts = get_timesteps(0.0, 1.0, steps=200)
    x0 = jnp.zeros((2048, 2))
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, reference_log_prob,
            return_traj=False,
        )
    )(jax.random.PRNGKey(1), x0)
    # rnd = log p_ref(X_T) - log rho(X_T) = -logZ exactly, for every sample
    assert jnp.allclose(res.rnd, -LOG_Z, atol=1e-4)
    stats = loss.compute_results_arrays(res.rnd, res.rnd_no_ito)
    assert float(stats["log_norm_const_is"]) == pytest.approx(LOG_Z, abs=1e-4)
    assert float(stats["lv_loss"]) < 1e-8


def test_exponential_integrator_preserves_reference():
    """Zero control: terminal marginal is N(0, sigma^2) when alpha*sqrt(dt) schedule mixes enough."""
    sigma = 1.0
    loss = ExponentialIntegratorSDELoss(
        generative_ctrl=lambda t, x: jnp.zeros_like(x),
        method="lv",
        alpha=1.0,
        sigma=sigma,
    )
    prior = IsotropicGauss(dim=2, loc=0.0, scale=sigma)
    target = IsotropicGauss(dim=2, loc=0.0, scale=sigma, log_norm_const=LOG_Z)
    ts = get_timesteps(0.0, 6.4, dt=0.05, rescale_t="cosine")
    x0 = prior.sample(jax.random.PRNGKey(0), (4096,))
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=False
        )
    )(jax.random.PRNGKey(1), x0)
    # OU with invariant distribution = prior: rnd = -logZ for all paths
    assert jnp.allclose(res.rnd, -LOG_Z, atol=1e-4)


def test_lv_detach_semantics():
    """The LV loss drives the SDE with a detached control: the trajectory
    itself must carry no gradient, while the KL path does."""
    prior, target, sde, _ = make_stationary_problem()
    ts = get_timesteps(0.0, 1.0, steps=20)
    x0 = prior.sample(jax.random.PRNGKey(0), (256,))

    def terminal_mean(theta, change_sde_ctrl):
        ctrl = lambda t, x: theta * x
        loss = TimeReversalLoss(generative_ctrl=ctrl, sde=sde, method="lv")
        res = loss.simulate(
            jax.random.PRNGKey(1), ts, x0,
            terminal_unnorm_log_prob=target.unnorm_log_prob,
            initial_log_prob=prior.log_prob,
            train=True,
            change_sde_ctrl=change_sde_ctrl,
        )
        return res.samples.mean()

    g_detached = jax.grad(terminal_mean)(0.5, True)
    g_live = jax.grad(terminal_mean)(0.5, False)
    assert float(g_detached) == 0.0
    assert abs(float(g_live)) > 0.0

    def make_loss(theta, method):
        ctrl = lambda t, x: theta * x
        loss = TimeReversalLoss(generative_ctrl=ctrl, sde=sde, method=method)
        val, _ = loss(
            jax.random.PRNGKey(1), ts, x0,
            target.unnorm_log_prob, prior.log_prob,
        )
        return val

    g_lv = jax.grad(make_loss)(0.5, "lv")
    g_kl = jax.grad(make_loss)(0.5, "kl")
    assert np.isfinite(g_lv) and np.isfinite(g_kl)


def test_divergence_exact_and_hutchinson():
    a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])

    def fn(t, x):
        return x @ a.T

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    div, val = divx_exact(fn, 0.0, x)
    assert jnp.allclose(div, 5.0)  # trace(a)
    assert jnp.allclose(val, fn(0.0, x))
    div_h, _ = divx_hutchinson(
        fn, 0.0, x, jax.random.PRNGKey(1), noise_type="rademacher", n_samples=64
    )
    assert float(jnp.abs(div_h.mean() - 5.0)) < 0.5


def test_divergence_exact_high_dim_branch():
    """d>64 takes the sequential O(B*d)-memory scan path; must agree with
    the analytic trace and stay differentiable."""
    d = 100
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (d, d)) / d

    def fn(t, x):
        return jnp.tanh(x) @ a.T

    x = jax.random.normal(jax.random.PRNGKey(3), (8, d))
    div, val = divx_exact(fn, 0.0, x)
    # analytic: div = sum_i a_ii * (1 - tanh(x_i)^2)
    expected = ((1 - jnp.tanh(x) ** 2) * jnp.diag(a)[None, :]).sum(
        axis=-1, keepdims=True
    )
    np.testing.assert_allclose(np.asarray(div), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)
    assert jnp.allclose(val, fn(0.0, x))
    # reverse-differentiable (used with gradients when div_estimator=None)
    g = jax.grad(lambda xx: divx_exact(fn, 0.0, xx)[0].sum())(x)
    assert bool(jnp.isfinite(g).all())


def test_masked_reductions_match_numpy():
    x = jnp.asarray([1.0, 2.0, 3.0, 100.0]).reshape(-1, 1)
    mask = jnp.asarray([True, True, True, False]).reshape(-1, 1)
    assert float(masked_mean(x, mask)) == pytest.approx(2.0)
    assert float(masked_var(x, mask)) == pytest.approx(1.0)  # unbiased


def test_max_rnd_filtering():
    prior, target, sde, ctrl = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl, sde=sde, method="lv", max_rnd=-1e9
    )
    ts = get_timesteps(0.0, 1.0, steps=10)
    x0 = prior.sample(jax.random.PRNGKey(0), (64,))
    val, metrics = loss(
        jax.random.PRNGKey(1), ts, x0, target.unnorm_log_prob, prior.log_prob
    )
    # everything filtered
    assert int(metrics["train/n_filtered"]) == 64


def test_lv_traj_variance_over_trajectories():
    prior, target, sde, ctrl = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl, sde=sde, method="lv_traj", traj_per_sample=4
    )
    ts = get_timesteps(0.0, 1.0, steps=50)
    x0 = prior.sample(jax.random.PRNGKey(0), (64,))
    val, _ = loss(
        jax.random.PRNGKey(1), ts, x0, target.unnorm_log_prob, prior.log_prob
    )
    assert np.isfinite(float(val))
    assert float(val) >= 0.0


def test_results_arrays_max_rnd_filtered_variants():
    """The eval-side max_rnd filter (table-fallback convention) must drop
    BOTH non-finite rnd and finite outliers above the training cutoff —
    finite-only filtering leaves a 1e33 outlier in (funnel seed 3)."""
    from sde_sampler_tpu.losses.oc import BaseOCLoss

    rnd = jnp.array([1.0, 2.0, jnp.inf, 1e33, 3.0])
    rnd_no_ito = jnp.array([1.0, 2.0, jnp.nan, 1e33, 3.0])
    stats = BaseOCLoss.compute_results_arrays(rnd, rnd_no_ito, max_rnd=1e8)

    # unfiltered primary: wrecked by the inf / outlier (reference parity)
    assert not np.isfinite(float(stats["log_norm_const_lb_ito"]))
    # finite-only: inf dropped, 1e33 kept
    assert float(stats["log_norm_const_lb_ito_finite"]) < -1e30
    # filtered: both dropped -> mean of -(1,2,3)
    np.testing.assert_allclose(
        float(stats["log_norm_const_lb_ito_filtered"]), -2.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(stats["log_norm_const_lb_filtered"]), -2.0, rtol=1e-6
    )
    assert int(stats["n_nonfinite_rnd"]) == 1
    assert int(stats["n_filtered_rnd"]) == 2

    # max_rnd=None: filtered degenerates to finite
    stats = BaseOCLoss.compute_results_arrays(rnd, rnd_no_ito, max_rnd=None)
    np.testing.assert_allclose(
        float(stats["log_norm_const_lb_ito_filtered"]),
        float(stats["log_norm_const_lb_ito_finite"]),
    )
