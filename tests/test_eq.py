"""SDE / integrator numerical tests.

Adds what the reference lacks (SURVEY §4): Euler-Maruyama weak convergence
against closed-form OU marginals, VP marginal identities, timestep-grid
properties, and controlled-SDE time reversal conventions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sde_sampler_tpu.eq.integrator import EulerIntegrator, HeunIntegrator
from sde_sampler_tpu.eq.sdes import VP, ConstOU, ControlledSDE, ScaledBM
from sde_sampler_tpu.utils.common import get_timesteps


def test_timesteps_grids():
    ts = get_timesteps(0.0, 1.0, steps=10)
    assert ts.shape == (11,)
    np.testing.assert_allclose(np.asarray(ts[0]), 0.0)
    np.testing.assert_allclose(np.asarray(ts[-1]), 1.0, rtol=1e-6)

    quad = get_timesteps(0.0, 2.0, steps=50, rescale_t="quad")
    assert quad.shape == (51,)
    assert float(quad[-1]) == pytest.approx(2.0, rel=1e-5)
    diffs = np.diff(np.asarray(quad))
    assert (diffs >= -1e-6).all()
    # quad spacing: early steps are larger than late steps
    assert diffs[0] > diffs[-1]

    cos = get_timesteps(0.0, 6.4, dt=0.05, rescale_t="cosine")
    assert float(cos[0]) == 0.0
    assert float(cos[-1]) == pytest.approx(6.4, rel=1e-4)
    dcos = np.diff(np.asarray(cos))
    # the cos^4 tail underflows float32 spacing; steps must never go back
    assert (dcos >= 0).all()
    assert (dcos[: len(dcos) // 2] > 0).all()

    with pytest.raises(ValueError):
        get_timesteps(0.0, 1.0)
    with pytest.raises(ValueError):
        get_timesteps(0.0, 1.0, dt=0.1, steps=5)


def test_const_ou_marginals_match_euler():
    sde = ConstOU(drift_coeff=1.0, diff_coeff=1.5, generative=False)
    x0 = jnp.full((200_000, 1), 2.0)
    ts = get_timesteps(0.0, 1.0, steps=2)
    integrator = EulerIntegrator(steps=400)
    xs = integrator.integrate(sde, ts, x0, jax.random.PRNGKey(0))
    loc, var = sde.marginal_params(jnp.asarray(1.0), jnp.asarray([[2.0]]))
    emp_mean = float(xs[-1].mean())
    emp_var = float(xs[-1].var())
    assert emp_mean == pytest.approx(float(loc[0, 0]), abs=0.01)
    assert emp_var == pytest.approx(float(var), rel=0.02)


def test_vp_marginal_identities():
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0, generative=False)
    # integral of the linear schedule over [0, T]
    t = jnp.asarray(1.0)
    int_drift = sde.int_drift_coeff_t(jnp.asarray(0.0), t)
    expected = -0.25 * (0.1 + 10.0)  # sign * 0.25 * (b(0)+b(T)) * T
    assert float(int_drift) == pytest.approx(expected, rel=1e-6)
    loc, var = sde.marginal_params(t, jnp.asarray([[1.0]]))
    assert float(loc[0, 0]) == pytest.approx(np.exp(expected), rel=1e-5)
    assert float(var) == pytest.approx(1 - np.exp(2 * expected), rel=1e-5)
    # variance-preserving: unit-variance input stays unit variance
    _, var1 = sde.marginal_params(t, jnp.zeros((1, 1)), var_init=1.0)
    assert float(var1) == pytest.approx(1.0, rel=1e-5)


def test_vp_marginal_matches_simulation():
    sde = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0, generative=False)
    x0 = jnp.full((200_000, 1), 1.5)
    ts = jnp.asarray([0.0, 1.0])
    xs = EulerIntegrator(steps=800).integrate(
        sde, ts, x0, jax.random.PRNGKey(0)
    )
    loc, var = sde.marginal_params(jnp.asarray(1.0), jnp.asarray([[1.5]]))
    assert float(xs[-1].mean()) == pytest.approx(float(loc[0, 0]), abs=0.01)
    assert float(xs[-1].var()) == pytest.approx(float(var), rel=0.03)


def test_heun_matches_euler_weakly_for_additive_noise():
    sde = ScaledBM(diff_coeff=1.0)
    x0 = jnp.zeros((100_000, 2))
    ts = jnp.asarray([0.0, 1.0])
    xs_e = EulerIntegrator(steps=100).integrate(
        sde, ts, x0, jax.random.PRNGKey(0)
    )
    xs_h = HeunIntegrator(steps=100).integrate(
        sde, ts, x0, jax.random.PRNGKey(0)
    )
    assert float(xs_e[-1].var()) == pytest.approx(1.0, rel=0.03)
    assert float(xs_h[-1].var()) == pytest.approx(1.0, rel=0.03)


def test_controlled_sde_time_reversal_convention():
    base = VP(diff_coeff_sq_min=0.1, diff_coeff_sq_max=10.0, generative=False)
    calls = []

    def ctrl(t, x):
        calls.append(float(t))
        return jnp.zeros_like(x)

    csde = ControlledSDE(sde=base, ctrl=ctrl)
    x = jnp.zeros((4, 2))
    csde.drift(jnp.asarray(0.25), x)
    # inference-direction SDE queries the control at terminal_t - t
    assert calls[-1] == pytest.approx(0.75)


def test_interpolation_onto_output_grid():
    class Drift(ScaledBM):
        def drift(self, t, x):
            return jnp.ones_like(x)  # dx/dt = 1

        def diff(self, t, x):
            return jnp.zeros(())

    d = Drift(diff_coeff=1.0)
    x0 = jnp.zeros((1, 1))
    ts = jnp.asarray([0.0, 0.25, 0.5, 1.0])
    xs = EulerIntegrator(steps=100).integrate(d, ts, x0, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(xs[:, 0, 0]), [0.0, 0.25, 0.5, 1.0], atol=1e-5
    )


def test_virtual_brownian_tree_statistics():
    from sde_sampler_tpu.eq.integrator import VirtualBrownianTree

    bm = VirtualBrownianTree(0.0, 1.0, jax.random.PRNGKey(0), (50_000, 1))
    assert float(jnp.abs(bm(0.0)).max()) < 1e-6
    # marginal variance ~ t; disjoint increments uncorrelated
    w_half = bm(0.5)
    w_one = bm(1.0)
    assert float(w_half.var()) == pytest.approx(0.5, rel=0.05)
    assert float(w_one.var()) == pytest.approx(1.0, rel=0.05)
    inc = w_one - w_half
    assert float(inc.var()) == pytest.approx(0.5, rel=0.05)
    corr = float((w_half * inc).mean()) / 0.5
    assert abs(corr) < 0.05
    # refinement consistency: W is a pure function of t
    assert float(jnp.abs(bm(0.5) - w_half).max()) == 0.0


def test_virtual_brownian_tree_continuity():
    from sde_sampler_tpu.eq.integrator import VirtualBrownianTree

    bm = VirtualBrownianTree(0.0, 1.0, jax.random.PRNGKey(1), (1000, 1))
    delta = float(jnp.abs(bm(0.3 + 1e-7) - bm(0.3)).max())
    assert delta < 1e-2


def test_adaptive_heun_exact_on_ode():
    """Zero diffusion: adaptive Heun integrates dx = -x dt to ~exp(-1)."""
    from sde_sampler_tpu.eq.integrator import AdaptiveHeunIntegrator

    class ODE:
        def drift(self, t, x):
            return -x

        def diff(self, t, x):
            return jnp.zeros_like(x)

    ts = get_timesteps(0.0, 1.0, steps=4)
    x0 = jnp.ones((8, 3))
    integ = AdaptiveHeunIntegrator(dt=0.05, rtol=1e-5, atol=1e-7)
    xs = integ.integrate(ODE(), ts, x0, jax.random.PRNGKey(0))
    assert xs.shape == (5, 8, 3)
    np.testing.assert_allclose(
        np.asarray(xs[-1]), np.exp(-1.0) * np.ones((8, 3)), rtol=1e-4
    )


def test_adaptive_heun_const_ou_marginals():
    sde = ConstOU(drift_coeff=1.0, diff_coeff=1.5, generative=False)
    from sde_sampler_tpu.eq.integrator import AdaptiveHeunIntegrator

    x0 = jnp.full((100_000, 1), 2.0)
    ts = get_timesteps(0.0, 1.0, steps=2)
    integ = AdaptiveHeunIntegrator(dt=0.02, rtol=1e-2, atol=1e-2)
    xs = jax.jit(lambda k: integ.integrate(sde, ts, x0, k))(
        jax.random.PRNGKey(3)
    )
    loc, var = sde.marginal_params(jnp.asarray(1.0), jnp.asarray([[2.0]]))
    assert float(xs[-1].mean()) == pytest.approx(float(loc[0, 0]), abs=0.02)
    assert float(xs[-1].var()) == pytest.approx(float(var), rel=0.05)


def test_adaptive_heun_honors_timesteps_grid():
    """`timesteps` is the internal grid contract all integrators share: the
    adaptive controller refines WITHIN each timesteps segment and the result
    is interpolated onto the output grid ts (regression: the argument used
    to be silently ignored)."""
    from sde_sampler_tpu.eq.integrator import AdaptiveHeunIntegrator

    class ODE:
        def drift(self, t, x):
            return -x

        def diff(self, t, x):
            return jnp.zeros_like(x)

    ts = jnp.asarray([0.0, 0.3, 1.0])
    internal = get_timesteps(0.0, 1.0, steps=16)
    x0 = jnp.ones((4, 2))
    integ = AdaptiveHeunIntegrator(dt=0.05, rtol=1e-5, atol=1e-7)
    xs = integ.integrate(ODE(), ts, x0, jax.random.PRNGKey(0),
                         timesteps=internal)
    # output aligned to ts, not to the internal grid
    assert xs.shape == (3, 4, 2)
    np.testing.assert_allclose(
        np.asarray(xs[1]), np.exp(-0.3) * np.ones((4, 2)), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(xs[2]), np.exp(-1.0) * np.ones((4, 2)), rtol=1e-3
    )


def test_euler_strong_convergence_order():
    """EM on additive noise has strong order 1: driving two resolutions
    with the SAME VirtualBrownianTree path, halving dt by 8x shrinks the
    pathwise error ~8x (reference exposes the same Brownian-reuse via the
    integrator `bm` argument)."""
    from sde_sampler_tpu.eq.integrator import VirtualBrownianTree
    from sde_sampler_tpu.eq.sdes import ConstOU

    sde = ConstOU(drift_coeff=1.0, diff_coeff=1.0, generative=False)
    x0 = jnp.full((8, 1), 1.5)
    ts = jnp.asarray([0.0, 1.0])
    bm = VirtualBrownianTree(0.0, 1.0, jax.random.PRNGKey(7), x0.shape)
    key = jax.random.PRNGKey(0)  # unused when bm drives the noise

    def terminal(steps):
        integrator = EulerIntegrator(steps=steps)
        return integrator.integrate(sde, ts, x0, key, bm=bm)[-1]

    reference = terminal(4096)
    err_coarse = float(jnp.abs(terminal(64) - reference).max())
    err_fine = float(jnp.abs(terminal(512) - reference).max())
    assert err_coarse > err_fine > 0
    # order ~1 => ratio ~8; leave slack but exclude order 1/2 (ratio ~2.8)
    assert err_coarse / err_fine > 4.5, (err_coarse, err_fine)


class _ThetaOU:
    """Minimal SDE with a traced drift parameter for adjoint-grad tests."""

    def __init__(self, theta):
        self.theta = theta

    def drift(self, t, x):
        return -self.theta * x + jnp.sin(self.theta * t)

    def diff(self, t, x):
        return 0.4


def test_adjoint_euler_forward_matches_direct():
    """adjoint=True must change ONLY the backward pass: forward values on
    the same Brownian-tree path are bitwise-close to the direct path."""
    from sde_sampler_tpu.eq.integrator import VirtualBrownianTree

    key = jax.random.PRNGKey(11)
    x0 = jnp.linspace(-1.0, 1.0, 12).reshape(6, 2)
    ts = jnp.asarray([0.0, 0.5, 1.0])
    sde = _ThetaOU(jnp.asarray(0.8))
    bm = VirtualBrownianTree(0.0, 1.0, key, x0.shape, depth=18)

    direct = EulerIntegrator(steps=64).integrate(sde, ts, x0, key, bm=bm)
    adj = EulerIntegrator(steps=64, adjoint=True, depth=18).integrate(
        sde, ts, x0, key
    )
    np.testing.assert_allclose(np.asarray(adj), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("steps,tol", [(64, 0.05), (256, 0.015)])
def test_adjoint_euler_gradients_converge_to_direct(steps, tol):
    """Continuous-adjoint gradients approach direct-autodiff gradients as
    dt -> 0 (reverse Euler reconstruction is the O(dt) term). Mirrors the
    reference's sdeint vs sdeint_adjoint equivalence (reference
    eq/integrator.py:60)."""
    from sde_sampler_tpu.eq.integrator import VirtualBrownianTree

    key = jax.random.PRNGKey(5)
    x0 = jnp.linspace(0.3, 1.2, 8).reshape(4, 2)
    ts = jnp.asarray([0.0, 1.0])

    def loss(theta, adjoint):
        sde = _ThetaOU(theta)
        if adjoint:
            integ = EulerIntegrator(steps=steps, adjoint=True, depth=18)
            xs = integ.integrate(sde, ts, x0, key)
        else:
            bm = VirtualBrownianTree(0.0, 1.0, key, x0.shape, depth=18)
            xs = EulerIntegrator(steps=steps).integrate(
                sde, ts, x0, key, bm=bm
            )
        return (xs[-1] ** 2).mean() + jnp.abs(xs[-1]).sum() * 0.1

    theta = jnp.asarray(0.7)
    g_direct = float(jax.grad(loss)(theta, False))
    g_adjoint = float(jax.jit(jax.grad(loss), static_argnums=1)(theta, True))
    assert g_direct != 0.0
    assert abs(g_adjoint - g_direct) / abs(g_direct) < tol, (
        g_adjoint, g_direct
    )
