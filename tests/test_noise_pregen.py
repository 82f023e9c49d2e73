"""noise_pregen=True hoists all per-step PRNG out of the rollout scan.

The stream changes (one batched draw instead of per-step splits), the
distribution must not: the analytic oracles from test_losses must hold in
both modes, and every structural feature (trajectories, exploration noise,
Hutchinson probes, remat, unroll) must still compile and run.
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

from test_losses import LOG_Z, make_stationary_problem


def test_time_reversal_pregen_matches_oracle():
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl_opt, sde=sde, method="lv", noise_pregen=True
    )
    ts = get_timesteps(0.0, 1.0, steps=1000)
    x0 = prior.sample(jax.random.PRNGKey(0), (4096,))
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=False
        )
    )(jax.random.PRNGKey(1), x0)
    stats = loss.compute_results_arrays(res.rnd, res.rnd_no_ito)
    assert float(stats["log_norm_const_is"]) == pytest.approx(LOG_Z, abs=0.05)
    assert float(stats["log_norm_const_lb_ito"]) == pytest.approx(
        LOG_Z, abs=0.05
    )
    assert float(stats["lv_loss"]) < 0.1

    l_lv, _ = jax.jit(
        lambda k, x: loss(k, ts, x, target.unnorm_log_prob, prior.log_prob)
    )(jax.random.PRNGKey(2), x0)
    assert float(l_lv) < 0.1


def test_reference_sde_pregen_exact():
    sde = ScaledBM(diff_coeff=1.0, terminal_t=1.0, generative=True)
    target = IsotropicGauss(dim=2, loc=0.0, scale=1.0, log_norm_const=LOG_Z)
    reference_log_prob = IsotropicGauss(dim=2, loc=0.0, scale=1.0).log_prob
    loss = ReferenceSDELoss(
        generative_ctrl=lambda t, x: jnp.zeros_like(x),
        sde=sde,
        method="lv",
        noise_pregen=True,
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


def test_exponential_integrator_pregen_exact():
    sigma = 1.0
    loss = ExponentialIntegratorSDELoss(
        generative_ctrl=lambda t, x: jnp.zeros_like(x),
        method="lv",
        alpha=1.0,
        sigma=sigma,
        noise_pregen=True,
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
    assert jnp.allclose(res.rnd, -LOG_Z, atol=1e-4)


def test_pregen_step_keys_and_traj_and_grad():
    """Exploration noise forces the per-step-key branch; remat + unroll +
    trajectory output + gradient all work under pregen."""
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl_opt,
        sde=sde,
        method="lv",
        sde_ctrl_noise=0.1,
        noise_pregen=True,
        scan_unroll=2,
    )
    ts = get_timesteps(0.0, 1.0, steps=64)
    x0 = prior.sample(jax.random.PRNGKey(0), (256,))

    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=True
        )
    )(jax.random.PRNGKey(1), x0)
    assert res.xs.shape == (64 + 1 - 1 + 1, 256, 2)  # (T+1, B, d)
    assert bool(jnp.isfinite(res.rnd).all())

    def scalar_loss(theta, key):
        scaled = TimeReversalLoss(
            generative_ctrl=lambda t, x: theta * ctrl_opt(t, x),
            sde=sde,
            method="lv",
            noise_pregen=True,
        )
        l, _ = scaled(key, ts, x0, target.unnorm_log_prob, prior.log_prob)
        return l

    g = jax.jit(jax.grad(scalar_loss))(1.3, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(g))


def test_pregen_hbm_ceiling_falls_back_to_inloop(monkeypatch):
    """simulate() must NOT materialize the (T-1, B, d) pregen buffer when
    it exceeds PREGEN_MAX_BYTES (the r5 cox_whitened_60k eval OOM: 800
    eval steps x 100k batch x d=1600 = 512 GB on a 16 GB v5e). With the
    ceiling forced to 0 the in-loop-noise branch must produce the same
    oracle values."""
    import sde_sampler_tpu.losses.oc as oc_mod

    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl_opt, sde=sde, method="lv", noise_pregen=True
    )
    ts = get_timesteps(0.0, 1.0, steps=1000)
    x0 = prior.sample(jax.random.PRNGKey(0), (4096,))

    monkeypatch.setattr(oc_mod, "PREGEN_MAX_BYTES", 0)
    assert not loss._pregen_fits(ts, x0)
    res = jax.jit(
        lambda k, x: loss.eval(
            k, ts, x, target.unnorm_log_prob, prior.log_prob, return_traj=False
        )
    )(jax.random.PRNGKey(1), x0)
    stats = loss.compute_results_arrays(res.rnd, res.rnd_no_ito)
    assert float(stats["log_norm_const_is"]) == pytest.approx(LOG_Z, abs=0.05)
    assert float(stats["log_norm_const_lb_ito"]) == pytest.approx(
        LOG_Z, abs=0.05
    )

    # The two-phase training loss needs the buffer structurally; over the
    # ceiling it must fail loudly at trace time, not OOM on device.
    loss_tp = TimeReversalLoss(
        generative_ctrl=ctrl_opt, sde=sde, method="lv", two_phase=True
    )
    with pytest.raises(AssertionError, match="PREGEN_MAX_BYTES"):
        loss_tp(
            jax.random.PRNGKey(2), ts, x0,
            target.unnorm_log_prob, prior.log_prob,
        )


def test_pregen_fits_arithmetic():
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(generative_ctrl=ctrl_opt, sde=sde, method="lv")
    # cox eval shape: 800 steps x 100k x 1600 f32 = 512 GB >> ceiling
    ts = jnp.zeros(801)
    x = jax.ShapeDtypeStruct((100_000, 1600), jnp.float32)
    assert not loss._pregen_fits(ts, x)
    # funnel eval shape: 200 x 100k x 10 f32 = 0.8 GB — fits
    ts_f = jnp.zeros(201)
    x_f = jax.ShapeDtypeStruct((100_000, 10), jnp.float32)
    assert loss._pregen_fits(ts_f, x_f)


def test_pregen_hutchinson_divergence_runs():
    """inference_ctrl + Hutchinson probes consume the pregen step keys."""
    prior, target, sde, ctrl_opt = make_stationary_problem()
    loss = TimeReversalLoss(
        generative_ctrl=ctrl_opt,
        sde=sde,
        method="kl",
        inference_ctrl=lambda t, x: -0.5 * x,
        div_estimator="rademacher",
        noise_pregen=True,
    )
    ts = get_timesteps(0.0, 1.0, steps=32)
    x0 = prior.sample(jax.random.PRNGKey(0), (128,))
    l, _ = jax.jit(
        lambda k, x: loss(k, ts, x, target.unnorm_log_prob, prior.log_prob)
    )(jax.random.PRNGKey(1), x0)
    assert bool(jnp.isfinite(l))
