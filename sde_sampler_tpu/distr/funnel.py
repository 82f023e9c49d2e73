"""Neal's funnel target (d=10 default).

Parity with /root/reference/sde_sampler/distr/funnel.py: x₀ ~ N(0, σ²),
x_i | x₀ ~ N(0, exp(x₀)); analytic score, exact sampler, Monte-Carlo
marginals for i > 0.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Distribution
from .gauss import IsotropicGauss

_LOG_2PI = math.log(2.0 * math.pi)


class Funnel(Distribution):
    def __init__(
        self,
        dim: int = 10,
        variance: float | None = None,
        n_reference_samples: int = int(1e7),
        log_norm_const: float = 0.0,
        domain_first_scale: float = 5.0,
        domain_other_scale: float = 5.0,
        domain_tol: float | None = 1e-5,
        **kwargs,
    ):
        super().__init__(
            dim=dim,
            log_norm_const=log_norm_const,
            n_reference_samples=n_reference_samples,
            **kwargs,
        )
        self.variance = variance if variance is not None else self.dim - 1
        self.distr_first = IsotropicGauss(
            dim=1,
            scale=math.sqrt(self.variance),
            domain_scale=domain_first_scale,
            domain_tol=domain_tol,
        )

        if self.domain is None:
            first = self.distr_first.domain
            domain_other = jnp.sign(first) * jnp.exp(
                jnp.abs(first) / domain_other_scale
            )
            self.set_domain(
                jnp.concatenate([first, jnp.tile(domain_other, (self.dim - 1, 1))])
            )
        if domain_tol is not None and (self.pdf(self.domain.T) > domain_tol).any():
            raise ValueError("Domain does not satisfy tolerance at the boundary.")

    @staticmethod
    def log_prob_other(x_other: jnp.ndarray, x_first: jnp.ndarray) -> jnp.ndarray:
        norm_const = -x_other.shape[-1] * (x_first + _LOG_2PI) / 2.0
        x_sq_sum = (x_other**2).sum(axis=-1, keepdims=True)
        return norm_const - 0.5 * x_sq_sum * jnp.exp(-x_first)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        x_first = x[:, 0:1]
        log_prob_first = self.distr_first.unnorm_log_prob(x_first)
        log_prob_other = Funnel.log_prob_other(x[:, 1:], x_first)
        return log_prob_first + log_prob_other + self.log_norm_const

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x_first = x[:, 0:1]
        x_other = x[:, 1:]
        inv_var_other = jnp.exp(-x_first)
        score_first = self.distr_first.score(x_first) - 0.5 * x_other.shape[-1]
        score_first += 0.5 * (x_other**2).sum(axis=-1, keepdims=True) * inv_var_other
        score_other = -x_other * inv_var_other
        return jnp.concatenate([score_first, score_other], axis=-1)

    def marginal(self, x: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
        x = jnp.asarray(x).reshape(-1, 1)
        if dim == 0:
            return self.distr_first.marginal(x)
        n_mc = min(self.n_reference_samples or 10**6, 10**6)
        samples_first = self.distr_first.sample(
            jax.random.PRNGKey(0), (n_mc, 1)
        )  # (n_mc, 1, 1): broadcasts against the (Q, 1) query points
        log_prob = self.log_prob_other(x, samples_first)
        return jnp.exp(log_prob).mean(axis=0)

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        key_first, key_other = jax.random.split(key)
        samples_first = self.distr_first.sample(key_first, shape)
        stdd_other = jnp.exp(0.5 * samples_first)
        samples_other = jax.random.normal(key_other, (*shape, self.dim - 1))
        return jnp.concatenate(
            (samples_first, samples_other * stdd_other), axis=-1
        )
