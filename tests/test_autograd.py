"""utils/autograd helper tests (reference utils/autograd.py surface)."""
import jax.numpy as jnp
import numpy as np

from sde_sampler_tpu.utils.autograd import (
    compute_derivatives,
    compute_divx,
    compute_gradx,
)


def test_compute_gradx():
    fn = lambda t, x: (t * x**2).sum(-1, keepdims=True)
    x = jnp.ones((4, 3))
    t = jnp.asarray(2.0)
    grad, out = compute_gradx(fn, t, x)
    np.testing.assert_allclose(np.asarray(grad), 4.0)
    np.testing.assert_allclose(np.asarray(out), 6.0)


def test_compute_divx_exact_and_estimated():
    fn = lambda t, x: t * x
    x = jnp.ones((4, 3))
    t = jnp.asarray(2.0)
    div, out = compute_divx(fn, t, x)
    np.testing.assert_allclose(np.asarray(div), 6.0)
    div_h, _ = compute_divx(fn, t, x, noise_type="rademacher", n_samples=8)
    np.testing.assert_allclose(np.asarray(div_h), 6.0, rtol=1e-5)


def test_compute_derivatives():
    fn = lambda t, x: (t * x**2).sum(-1, keepdims=True)
    x = jnp.ones((4, 3))
    t = jnp.asarray(2.0)
    gt, gx, lap, out = compute_derivatives(fn, t, x, compute_laplacian=True)
    np.testing.assert_allclose(np.asarray(gt), 12.0)  # sum over batch+dims
    np.testing.assert_allclose(np.asarray(gx), 4.0)
    np.testing.assert_allclose(np.asarray(lap), 12.0)  # 2t * d
    np.testing.assert_allclose(np.asarray(out), 6.0)
