"""Distribution tests: analytic vs autodiff scores, stats self-consistency.

Mirrors the reference's key correctness oracle (tests/distr_eval.py:45-55:
analytic score against the autograd fallback) plus quadrature/sampling
statistics checks.
"""
import jax
import jax.numpy as jnp
import pytest

from sde_sampler_tpu.distr.base import Distribution, sample_uniform
from sde_sampler_tpu.distr.cox import Cox
from sde_sampler_tpu.distr.delta import Delta
from sde_sampler_tpu.distr.double_well import DoubleWell, MultiWell
from sde_sampler_tpu.distr.funnel import Funnel
from sde_sampler_tpu.distr.gauss import GMM, Gauss, IsotropicGauss
from sde_sampler_tpu.distr.rings import Rings
from sde_sampler_tpu.distr.rosenbrock import Rosenbrock


def make_distributions():
    return {
        "gmm_grid": GMM(name="grid"),
        "gmm_heart": GMM(name="heart"),
        "gauss": Gauss(dim=3, loc=1.0, scale=2.0),
        "iso_gauss": IsotropicGauss(dim=5, loc=0.5, scale=1.5),
        "delta": Delta(dim=2, loc=1.0),
        "dw": DoubleWell(separation=2.0, shift=1.5),
        "mw": MultiWell(dim=5, n_double_wells=2),
        "funnel": Funnel(dim=10),
        "rings": Rings(),
        "rosenbrock": Rosenbrock(dim=4, flatness=10.0),
    }


@pytest.mark.parametrize("name", list(make_distributions().keys()))
def test_score_matches_autodiff(name):
    distr = make_distributions()[name]
    key = jax.random.PRNGKey(0)
    if distr.domain is not None:
        x = sample_uniform(key, distr.domain, 128)
    else:
        x = jax.random.normal(key, (128, distr.dim))
    analytic = distr.score(x)
    autodiff = Distribution.score(distr, x)
    scale = jnp.abs(autodiff).max() + 1.0
    assert jnp.abs(analytic - autodiff).max() / scale < 1e-4


def test_cox_score_matches_autodiff():
    cox = Cox()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 1600)) * 0.1 + cox.mu_zero
    analytic = cox.score(x)
    autodiff = Distribution.score(cox, x)
    scale = jnp.abs(autodiff).max() + 1.0
    assert jnp.abs(analytic - autodiff).max() / scale < 1e-3


def test_gauss_exact_stats():
    g = Gauss(dim=2, loc=1.0, scale=2.0, n_reference_samples=200_000)
    g.compute_stats(jax.random.PRNGKey(0))
    # E[sum x_i] = 2, E[sum x_i^2] = 2*(1+4) = 10
    assert g.expectations["sum"] == pytest.approx(2.0, abs=0.05)
    assert g.expectations["square"] == pytest.approx(10.0, rel=0.03)
    assert jnp.allclose(g.stddevs, 2.0, atol=0.05)


def test_double_well_quadrature_vs_sampling():
    dw = DoubleWell(separation=2.0, shift=0.0)
    dw.compute_stats()
    samples = dw.sample(jax.random.PRNGKey(0), (100_000,))
    emp_sq = float((samples**2).mean())
    assert emp_sq == pytest.approx(dw.expectations["square"], rel=0.02)
    assert float(samples.std()) == pytest.approx(float(dw.stddevs[0]), rel=0.02)
    # symmetric well: E[sum] = 0
    assert dw.expectations["sum"] == pytest.approx(0.0, abs=1e-3)


def test_multiwell_factorized_stats():
    mw = MultiWell(dim=4, n_double_wells=2, separation=2.0)
    mw.compute_stats()
    dw = DoubleWell(separation=2.0)
    dw.compute_stats()
    assert mw.log_norm_const == pytest.approx(
        2 * dw.log_norm_const + mw.gauss.log_norm_const, rel=1e-5
    )
    samples = mw.sample(jax.random.PRNGKey(1), (50_000,))
    assert samples.shape == (50_000, 4)
    emp = float((samples**2).sum(-1).mean())
    assert emp == pytest.approx(mw.expectations["square"], rel=0.05)


def test_funnel_sampling_consistency():
    f = Funnel(dim=10)
    samples = f.sample(jax.random.PRNGKey(0), (200_000,))
    # first coordinate is N(0, dim-1)
    assert float(samples[:, 0].std()) == pytest.approx(3.0, rel=0.02)
    lp = f.unnorm_log_prob(samples[:100])
    assert lp.shape == (100, 1)
    assert bool(jnp.isfinite(lp).all())


def test_rings_density_on_rings():
    r = Rings()
    # points exactly on a ring have log density 0 (max)
    theta = jnp.linspace(0, 2 * jnp.pi, 16)
    for radius in [1.0, 3.0, 5.0]:
        pts = radius * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        assert jnp.allclose(r.unnorm_log_prob(pts), 0.0, atol=1e-5)


def test_delta_sampling():
    d = Delta(dim=3, loc=2.0)
    s = d.sample(jax.random.PRNGKey(0), (7,))
    assert s.shape == (7, 3)
    assert jnp.allclose(s, 2.0)


def test_rejection_sampling_distribution():
    dw = DoubleWell(separation=2.0, shift=1.0)
    dw.compute_stats()
    samples = dw.sample(jax.random.PRNGKey(2), (50_000,))
    assert samples.shape == (50_000, 1)
    emp_abs = float(jnp.abs(samples).mean())
    assert emp_abs == pytest.approx(dw.expectations["abs"], rel=0.03)


def test_gmm_sample_moments():
    g = GMM(name="grid")
    samples = g.sample(jax.random.PRNGKey(0), (200_000,))
    assert float(samples.mean(0)[0]) == pytest.approx(0.0, abs=0.05)
    # variance = within (0.3) + between (mean of 25,0,25 over grid) = 0.3+50/3
    expected_var = 0.3 + 50.0 / 3.0
    assert float(samples[:, 0].var()) == pytest.approx(expected_var, rel=0.03)
    assert float(g.stddevs[0] ** 2) == pytest.approx(expected_var, rel=1e-4)


def test_gmm_fab_preset_reproduces_torch_constants():
    """fab/multi mode locations must match the torch-seeded FAB benchmark."""
    from sde_sampler_tpu.distr.gauss import gmm_params

    loc, scale, weights = gmm_params("fab")
    assert loc.shape == (40, 2)
    import torch

    generator = torch.Generator()
    generator.manual_seed(42)
    expected = ((torch.rand((40, 2), generator=generator) - 0.5) * 80).numpy()
    assert jnp.abs(loc - expected).max() < 1e-6
    # softplus(1.0) scale factor
    assert float(scale[0, 0]) == pytest.approx(1.3132617, rel=1e-5)

    loc_m, _, _ = gmm_params("multi")
    assert loc_m.shape == (80, 2)


def test_gmm_named_presets_all_construct():
    for name in ["heart", "dist", "fab", "multi", "grid", "circle"]:
        g = GMM(name=name, domain_tol=None)
        x = g.sample(jax.random.PRNGKey(0), (64,))
        assert bool(jnp.isfinite(g.unnorm_log_prob(x)).all()), name
        assert bool(jnp.isfinite(g.score(x)).all()), name
