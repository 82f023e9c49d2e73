"""Distribution protocol for targets and priors.

Capability parity with /root/reference/sde_sampler/distr/base.py: unnormalized
log-probability, score (analytic override or automatic via `jax.grad`),
domain boxes, reference statistics via exact sampling or Boole quadrature,
uniform/rejection sampling helpers.

JAX-native differences: explicit PRNG keys for all sampling; the default
score is a `jax.grad` transform (no mutable requires_grad state); statistics
are computed once eagerly at setup and stored as plain floats / arrays.
"""
from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

EXPECTATION_FNS: dict[str, Callable] = {
    "square": lambda x: (x**2).sum(axis=-1, keepdims=True),
    "abs": lambda x: jnp.abs(x).sum(axis=-1, keepdims=True),
    "sum": lambda x: x.sum(axis=-1, keepdims=True),
    "square_minus_sum": lambda x: (x**2 - x).sum(axis=-1, keepdims=True),
}

DATA_DIR = Path(__file__).parents[2] / "data"


class Distribution:
    """Base class: subclasses implement `unnorm_log_prob` ((B,d)->(B,1)).

    Optionally: `score`, `sample(key, shape)`, `marginal(x, dim)`, `filter`,
    `metrics`, `plots`, `objective`.
    """

    def __init__(
        self,
        dim: int,
        log_norm_const: float | None = None,
        domain=None,
        n_reference_samples: int | None = None,
        grid_points: int | None = None,
    ):
        self.dim = dim
        self.n_reference_samples = n_reference_samples
        self.grid_points = grid_points
        self.domain = None
        self.set_domain(domain)
        self.log_norm_const = log_norm_const
        self.stddevs = None
        self.expectations: dict[str, float] = {}

    # -- domain ------------------------------------------------------------
    def set_domain(self, d=None):
        if d is not None:
            d = jnp.asarray(d, dtype=jnp.float32)
            if d.ndim == 0:
                d = jnp.stack([-d, d], axis=-1)
            if d.ndim == 1:
                d = d[None, :]
            if d.shape == (1, 2):
                d = jnp.tile(d, (self.dim, 1))
            assert d.shape == (self.dim, 2)
        self.domain = d

    # -- reference statistics ---------------------------------------------
    def compute_stats_sampling(self, key: jax.Array):
        assert self.n_reference_samples is not None
        samples = self.sample(key, (self.n_reference_samples,))
        for name, fn in EXPECTATION_FNS.items():
            if name not in self.expectations:
                self.expectations[name] = float(fn(samples).mean())
        if self.stddevs is None:
            # ddof=1 matches the torch .std the reference computes these with
            self.stddevs = samples.std(axis=0, ddof=1)

    def compute_stats_integration(self):
        from sde_sampler_tpu.utils import quad

        def integrate(fn):
            return quad.integrate(
                fn, dim=self.dim, N=self.grid_points,
                integration_domain=self.domain,
            )

        if self.log_norm_const is None:
            norm_const = float(integrate(self.unnorm_pdf))
            self.log_norm_const = math.log(norm_const)

        for name, fn in EXPECTATION_FNS.items():
            if name not in self.expectations:
                self.expectations[name] = float(
                    integrate(lambda x: fn(x) * self.pdf(x))
                )
        if self.stddevs is None:
            means = jnp.atleast_1d(integrate(lambda x: x * self.pdf(x)))
            stddevs = jnp.sqrt(
                jnp.atleast_1d(
                    integrate(lambda x: (x - means) ** 2 * self.pdf(x))
                )
            )
            self.stddevs = stddevs

    def compute_stats(self, key: jax.Array | None = None):
        if hasattr(self, "sample") and self.n_reference_samples is not None:
            if key is None:
                key = jax.random.PRNGKey(0)
            self.compute_stats_sampling(key)
        elif self.grid_points is not None and self.domain is not None:
            self.compute_stats_integration()
        else:
            logging.warning(
                "Cannot compute statistics for distribution `%s`",
                self.__class__.__name__,
            )

    # -- densities ---------------------------------------------------------
    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.log_norm_const is None:
            raise NotImplementedError
        return self.unnorm_log_prob(x) - self.log_norm_const

    def pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.log_prob(x))

    def unnorm_pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.unnorm_log_prob(x))

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        """∇ₓ log ρ(x); default autodiff fallback (reference base.py:130-137)."""
        grad_fn = jax.grad(lambda xx: self.unnorm_log_prob(xx[None, :])[0, 0])
        return jax.vmap(grad_fn)(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.unnorm_log_prob(x)


def sample_uniform(
    key: jax.Array, domain: jnp.ndarray, batchsize: int = 1
) -> jnp.ndarray:
    dim = domain.shape[0]
    diam = domain[:, 1] - domain[:, 0]
    rand = jax.random.uniform(key, (batchsize, dim))
    return domain[:, 0] + rand * diam


def rejection_sampling(
    key: jax.Array,
    shape: tuple,
    proposal: Distribution,
    target: Distribution,
    scaling: float,
) -> jnp.ndarray:
    """Eager (host-side loop) rejection sampler; used for reference stats."""
    n_samples = math.prod(shape)
    collected: list[np.ndarray] = []
    n_collected = 0
    while n_collected < n_samples:
        key, sub_s, sub_u = jax.random.split(key, 3)
        n_prop = n_samples * int(math.ceil(scaling)) * 10
        samples = proposal.sample(sub_s, (n_prop,))
        unif = jax.random.uniform(sub_u, (samples.shape[0], 1))
        unif = unif * scaling * proposal.pdf(samples)
        accept = (unif < target.pdf(samples)).squeeze(-1)
        accepted = np.asarray(samples[accept])
        collected.append(accepted)
        n_collected += accepted.shape[0]
    out = np.concatenate(collected)[:n_samples]
    return jnp.asarray(out).reshape(*shape, -1)
