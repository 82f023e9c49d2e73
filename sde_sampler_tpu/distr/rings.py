"""Concentric-rings 2-d target.

Parity with /root/reference/sde_sampler/distr/rings.py: density
exp(-scale · min_i (|x| - r_i)²), analytic score, marginals via 1-d Boole
quadrature, and a domain boundary-tolerance check.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .base import Distribution


class Rings(Distribution):
    def __init__(
        self,
        dim: int = 2,
        lower_rad: float = 1.0,
        upper_rad: float = 5.0,
        num_rad: int = 3,
        scale: float = 100.0,
        grid_points: int = 2001**2,
        scale_domain: float = 10.0,
        domain_tol: float | None = 1e-5,
        eps: float = 1e-8,
        **kwargs,
    ):
        if dim != 2:
            raise ValueError("The rings should be two-dimensional.")
        super().__init__(dim=dim, grid_points=grid_points, **kwargs)
        self.r_centers = jnp.linspace(lower_rad, upper_rad, num_rad)
        self.scale = scale
        self.eps = eps

        self.domain_tol = domain_tol
        if self.domain is None:
            self.set_domain(
                float(self.r_centers.max())
                + scale_domain / math.sqrt(self.scale / 2)
            )

    def compute_stats(self, key=None):
        super().compute_stats(key)
        if (
            self.domain_tol is not None
            and (self.pdf(self.domain.T) > self.domain_tol).any()
        ):
            raise ValueError("Domain does not satisfy tolerance at the boundary.")

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        radius = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return (
            -self.scale
            * jnp.square(radius - self.r_centers).min(axis=-1, keepdims=True)
        )

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        radius = jnp.linalg.norm(x, axis=-1, keepdims=True)
        indices = jnp.square(radius - self.r_centers).argmin(axis=-1)
        centers = self.r_centers[indices][:, None]
        return -2.0 * self.scale * (1 - centers / (radius + self.eps)) * x

    def marginal(self, x: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
        from sde_sampler_tpu.utils import quad

        x = jnp.asarray(x).reshape(-1, 1)

        def integrand(y: jnp.ndarray) -> jnp.ndarray:
            # y: (B, 1) integration variable; combine with each query point
            xs = jnp.tile(x[None], (y.shape[0], 1, 1))  # (B, Q, 1)
            ys = jnp.tile(y[:, None, :], (1, x.shape[0], 1))
            if dim == 0:
                grid = jnp.concatenate([xs, ys], axis=-1)
            else:
                grid = jnp.concatenate([ys, xs], axis=-1)
            return self.pdf(grid.reshape(-1, 2)).reshape(y.shape[0], x.shape[0])

        integral = quad.integrate(
            integrand, dim=1, N=2001,
            integration_domain=self.domain[dim][None],
        )
        return integral.reshape(-1, 1)
