"""Derivative helpers with the reference's autograd-utility surface.

Parity with /root/reference/sde_sampler/utils/autograd.py (compute_gradx,
compute_divx, compute_derivatives) expressed as jax transforms: gradients
always "create graph" (JAX composes transforms), and divergences use
forward-mode JVPs (exact) or Hutchinson probes.
"""
from __future__ import annotations

from typing import Callable

import jax

from sde_sampler_tpu.losses.oc import divx_exact, divx_hutchinson


def compute_gradx(fn: Callable, t, x, *args, **kwargs):
    """(∇ₓ Σ fn(t, x), fn(t, x)) for batch-wise scalar outputs."""
    def scalar_fn(xx):
        return fn(t, xx, *args, **kwargs).sum()

    grad = jax.grad(scalar_fn)(x)
    return grad, fn(t, x, *args, **kwargs)


def compute_divx(
    fn: Callable, t, x, *args, noise_type: str | None = None,
    n_samples: int = 1, key=None, **kwargs,
):
    """(div fn(t, x) (B,1), fn(t, x)); exact or Hutchinson estimator."""
    wrapped = lambda tt, xx: fn(tt, xx, *args, **kwargs)
    if noise_type is None:
        return divx_exact(wrapped, t, x)
    if key is None:
        key = jax.random.PRNGKey(0)
    return divx_hutchinson(
        wrapped, t, x, key, noise_type=noise_type, n_samples=n_samples
    )


def compute_derivatives(
    fn: Callable, t, x, *args, compute_laplacian: bool = False, **kwargs,
):
    """(∂ₜfn, ∇ₓfn, Δfn?, fn) for scalar-per-sample fn(t, x)."""
    def scalar_fn(tt, xx):
        return fn(tt, xx, *args, **kwargs).sum()

    grad_t = jax.grad(scalar_fn, argnums=0)(t, x)
    grad_x_fn = jax.grad(scalar_fn, argnums=1)
    grad_x = grad_x_fn(t, x)
    laplacian = None
    if compute_laplacian:
        laplacian, _ = divx_exact(lambda tt, xx: grad_x_fn(tt, xx), t, x)
    outputs = fn(t, x, *args, **kwargs)
    return grad_t, grad_x, laplacian, outputs
