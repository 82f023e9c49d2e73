"""Fused Pallas sim rollout vs the lax.scan reference (interpret mode).

Hardware validation happens through bin/pallas_probe-style staged runs;
these tests pin the kernel's semantics on the CPU interpreter, including
with the real flagship control stack (LerpCtrl + FourierMLP + TimeEmbed
on the funnel target).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_tpu.ops.rollout_pallas import (
    exp_integrator_step_fn,
    fused_sim_rollout,
    sde_step_fn,
)


def scan_reference(step_fn, params, x0, ts, dbs):
    def body(x, inp):
        s, t, db = inp
        return step_fn(params, s, t, x, db), x

    x_T, xs = jax.lax.scan(body, x0, (ts[:-1], ts[1:], dbs))
    return xs, x_T


def test_fused_rollout_matches_scan_linear_ctrl():
    B, d, T = 64, 4, 16
    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(key, (d, d)) * 0.1,
        "b": jnp.asarray(0.3),
    }
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    ts = jnp.linspace(0.0, 1.0, T + 1)
    dbs = jax.random.normal(jax.random.PRNGKey(2), (T, B, d)) * 0.1

    def apply_ctrl(p, s, x):
        return jnp.dot(x, p["w"]) + p["b"] * s

    step = sde_step_fn(
        apply_ctrl, drift=lambda s, x: -0.5 * x, diff=lambda s, x: 1.3
    )
    xs_ref, xT_ref = scan_reference(step, params, x0, ts, dbs)
    xs, xT = fused_sim_rollout(
        step, params, x0, ts, dbs, block_b=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(xT_ref), atol=1e-5)


def test_fused_rollout_flagship_ctrl_stack():
    """Real DIS stack: LerpCtrl(FourierMLP + TimeEmbed score) on funnel."""
    from sde_sampler_tpu.distr.funnel import Funnel
    from sde_sampler_tpu.distr.gauss import IsotropicGauss
    from sde_sampler_tpu.eq.sdes import VP
    from sde_sampler_tpu.models.mlp import FourierMLP, TimeEmbed
    from sde_sampler_tpu.models.reparam import LerpCtrl

    d, B, T = 10, 32, 12
    target = Funnel(dim=d, n_reference_samples=1000)
    prior = IsotropicGauss(dim=d, loc=0.0, scale=1.0)
    sde = VP(
        diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0,
        scale_diff_coeff=1.0, terminal_t=1.0, generative=True,
    )
    ctrl = LerpCtrl(
        base_model=FourierMLP(dim=d, num_layers=4, channels=64),
        score_model=TimeEmbed(dim_out=1, num_layers=4, channels=64,
                              last_bias_init={"constant": 1.0}),
        sde=sde,
        prior_score=prior.score,
        target_score=target.score,
        clip_model=10.0,
        clip_score=10.0,
        detach_score=False,
    )
    variables = ctrl.init(jax.random.PRNGKey(0), jnp.zeros(()), jnp.zeros((2, d)))
    bundle = {"params": variables["params"]}

    def apply_ctrl(p, s, x):
        return ctrl.apply({"params": p["params"]}, s, x)

    step = sde_step_fn(
        apply_ctrl,
        drift=lambda s, x: sde.drift(s, x),
        diff=lambda s, x: sde.diff(s, x),
    )
    x0 = prior.sample(jax.random.PRNGKey(1), (B,))
    ts = jnp.linspace(0.0, 1.0, T + 1)
    dts = (ts[1:] - ts[:-1])[:, None, None]
    dbs = jax.random.normal(jax.random.PRNGKey(2), (T, B, d)) * jnp.sqrt(dts)

    xs_ref, xT_ref = scan_reference(step, bundle, x0, ts, dbs)
    xs, xT = fused_sim_rollout(
        step, bundle, x0, ts, dbs, block_b=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(xs_ref), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(xT), np.asarray(xT_ref), atol=2e-5, rtol=1e-5
    )


def test_fused_rollout_exp_integrator():
    B, d, T = 32, 3, 10
    params = {"w": jnp.eye(d) * 0.2}
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    ts = jnp.linspace(0.0, 6.4, T + 1)
    noises = jax.random.normal(jax.random.PRNGKey(2), (T, B, d))

    def apply_ctrl(p, s, x):
        return jnp.dot(x, p["w"])

    step = exp_integrator_step_fn(apply_ctrl, alpha=0.9, sigma=1.1)
    xs_ref, xT_ref = scan_reference(step, params, x0, ts, noises)
    xs, xT = fused_sim_rollout(
        step, params, x0, ts, noises, block_b=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(xT_ref), atol=1e-5)


def test_tile_autoshrink():
    """Oversized tile request shrinks until the per-step buffers fit."""
    from sde_sampler_tpu.ops.rollout_pallas import _tile_rows

    assert _tile_rows(10, 2048, 2048) == 2048
    # huge batches tile down to something VMEM-sized
    assert _tile_rows(10, 1 << 20, 1 << 20) <= 4096
