"""Gaussian-family targets and priors: GMM, Gauss, IsotropicGauss.

Capability parity with /root/reference/sde_sampler/distr/gauss.py (named GMM
presets heart/dist/fab/multi/grid/circle, analytic scores, truncated-normal
prior sampling), written with jax.numpy log-densities instead of
torch.distributions objects.
"""
from __future__ import annotations

import logging
import math
from numbers import Number

import jax
import jax.numpy as jnp
import numpy as np

from .base import Distribution

_LOG_2PI = math.log(2.0 * math.pi)


def gmm_params(name: str = "heart", dim: int = 2):
    """Named mixture presets (reference gauss.py:14-63)."""
    if name == "heart":
        loc = 1.5 * np.array(
            [
                [-0.5, -0.25],
                [0.0, -1],
                [0.5, -0.25],
                [-1.0, 0.5],
                [-0.5, 1.0],
                [0.0, 0.5],
                [0.5, 1.0],
                [1.0, 0.5],
            ]
        )
        factor = 1 / len(loc)
    elif name == "dist":
        loc = np.array(
            [
                [0.0, 0.0],
                [2, 0.0],
                [0.0, 3.0],
                [-4, 0.0],
                [0.0, -5],
            ]
        )
        factor = math.sqrt(0.2)
    elif name in ["fab", "multi"]:
        n_mixes, loc_scaling = (40, 40) if name == "fab" else (80, 80)
        # Mode locations must match the published FAB benchmark, which fixes
        # them with a torch generator seeded at 42 (reference gauss.py:43-47).
        # torch (CPU) is only used here at setup time to reproduce the exact
        # constants; nothing torch touches the compute path.
        import torch

        generator = torch.Generator()
        generator.manual_seed(42)
        loc = (
            (torch.rand((n_mixes, 2), generator=generator) - 0.5) * 2 * loc_scaling
        ).numpy()
        factor = math.log1p(math.e)  # softplus(1.0)
    elif name == "grid":
        x_coords = np.linspace(-5, 5, 3)
        loc = np.array([[a, b] for a in x_coords for b in x_coords])
        factor = math.sqrt(0.3)
    elif name == "circle":
        freq = 2 * np.pi * np.arange(1, 9) / 8
        loc = np.stack([4.0 * np.cos(freq), 4.0 * np.sin(freq)], axis=1)
        factor = math.sqrt(0.3)
    else:
        raise ValueError("Unknown mode for the Gaussian mixture.")

    if dim > 2:
        loc = np.concatenate([loc, np.zeros((loc.shape[0], dim - 2))], axis=1)
    scale = factor * np.ones_like(loc)
    weights = np.ones(loc.shape[0])
    return jnp.asarray(loc), jnp.asarray(scale), jnp.asarray(weights)


class GMM(Distribution):
    """Mixture of diagonal Gaussians with analytic log-prob/score/sampling."""

    def __init__(
        self,
        dim: int = 2,
        loc=None,
        scale=None,
        mixture_weights=None,
        n_reference_samples: int = int(1e7),
        name: str | None = None,
        log_norm_const: float = 0.0,
        domain_scale: float = 5,
        domain_tol: float | None = 1e-5,
        **kwargs,
    ):
        super().__init__(
            dim=dim,
            log_norm_const=log_norm_const,
            n_reference_samples=n_reference_samples,
            **kwargs,
        )
        if name is not None:
            if any(t is not None for t in [loc, scale, mixture_weights]):
                logging.warning(
                    "Ignoring loc, scale, and mixture weights since name is "
                    "specified."
                )
            loc, scale, mixture_weights = gmm_params(name, dim=dim)

        loc = jnp.atleast_2d(jnp.asarray(loc, dtype=jnp.float32))
        scale = jnp.atleast_2d(jnp.asarray(scale, dtype=jnp.float32))
        n_mixtures = loc.shape[0]
        if not loc.shape == scale.shape == (n_mixtures, self.dim):
            raise ValueError("Shape mismatch between loc and scale.")
        if mixture_weights is None:
            if n_mixtures > 1:
                raise ValueError("Require mixture weights.")
            mixture_weights = jnp.ones(1)
        mixture_weights = jnp.asarray(mixture_weights, dtype=jnp.float32)
        if mixture_weights.shape != (n_mixtures,):
            raise ValueError("Shape mismatch for the mixture weights.")

        self.loc = loc
        self.scale = scale
        self.mixture_weights = mixture_weights
        self.log_mix_weights = jnp.log(
            mixture_weights / mixture_weights.sum()
        )

        if self.domain is None:
            deviation = domain_scale * self.scale.max(axis=0)
            deviation = jnp.stack([-deviation, deviation], axis=-1)
            pos = jnp.stack(
                [self.loc.min(axis=0), self.loc.max(axis=0)], axis=-1
            )
            self.set_domain(pos + deviation)
        if domain_tol is not None and (self.pdf(self.domain.T) > domain_tol).any():
            raise ValueError("domain does not satisfy tolerance at the boundary.")

    @property
    def stddevs(self):
        if self._stddevs is not None:
            return self._stddevs
        # Mixture variance: E[var_k] + Var[mean_k] with uniform-ized weights
        w = jnp.exp(self.log_mix_weights)[:, None]
        mean = (w * self.loc).sum(axis=0)
        var = (w * (self.scale**2 + self.loc**2)).sum(axis=0) - mean**2
        return jnp.sqrt(var)

    @stddevs.setter
    def stddevs(self, value):
        self._stddevs = value

    def _component_log_probs(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, d) -> (B, K)
        diff = (x[:, None, :] - self.loc[None]) / self.scale[None]
        log_det = jnp.log(self.scale).sum(axis=-1)  # (K,)
        return (
            -0.5 * (diff**2).sum(axis=-1)
            - log_det[None]
            - 0.5 * self.dim * _LOG_2PI
            + self.log_mix_weights[None]
        )

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        comp = self._component_log_probs(x)
        log_prob = jax.nn.logsumexp(comp, axis=-1, keepdims=True)
        return log_prob + self.log_norm_const

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        comp = self._component_log_probs(x)  # (B, K)
        resp = jax.nn.softmax(comp, axis=-1)  # responsibilities
        per_comp_score = (self.loc[None] - x[:, None, :]) / (self.scale**2)[None]
        return (resp[:, :, None] * per_comp_score).sum(axis=1)

    def marginal(self, x: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
        x = jnp.asarray(x).reshape(-1, 1)
        w = jnp.exp(self.log_mix_weights)[None]
        comp = (
            -0.5 * ((x - self.loc[None, :, dim]) / self.scale[None, :, dim]) ** 2
            - jnp.log(self.scale[None, :, dim])
            - 0.5 * _LOG_2PI
        )
        return (w * jnp.exp(comp)).sum(axis=-1, keepdims=True)

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        key_cat, key_normal = jax.random.split(key)
        idx = jax.random.categorical(
            key_cat, self.log_mix_weights, shape=shape
        )
        eps = jax.random.normal(key_normal, (*shape, self.dim))
        return self.loc[idx] + self.scale[idx] * eps


class Gauss(GMM):
    """Single diagonal Gaussian (reference gauss.py:158-183)."""

    def __init__(self, dim: int = 1, loc=0.0, scale=1.0, **kwargs):
        params = {
            k: Gauss._prepare_input(p, dim)
            for k, p in {"loc": loc, "scale": scale}.items()
        }
        super().__init__(dim=dim, **params, **kwargs)
        self.stddevs = self.scale[0]

    @staticmethod
    def _prepare_input(param, dim: int = 1):
        if isinstance(param, Number):
            param = jnp.full((1, dim), float(param))
        param = jnp.atleast_2d(jnp.asarray(param, dtype=jnp.float32))
        if param.size == 1:
            param = jnp.tile(param, (1, dim))
        return param

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        return (self.loc - x) / self.scale**2


class IsotropicGauss(Gauss):
    """Isotropic Gaussian prior with optional quartile truncation."""

    def __init__(
        self,
        dim: int = 1,
        loc: float = 0.0,
        scale: float = 1.0,
        truncate_quartile: float | None = None,
        **kwargs,
    ):
        super().__init__(dim=dim, loc=loc, scale=scale, **kwargs)
        assert jnp.allclose(self.loc, self.loc[0, 0])
        assert jnp.allclose(self.scale, self.scale[0, 0])

        if truncate_quartile is not None:
            quartiles = jnp.asarray(
                [truncate_quartile / 2, 1 - truncate_quartile / 2]
            )
            # Normal inverse-CDF at the two quartiles
            icdf = self.loc[0, 0] + self.scale[0, 0] * jnp.sqrt(2.0) * jax.scipy.special.erfinv(2 * quartiles - 1)
            truncate_quartile = [float(icdf[0]), float(icdf[1])]
        self.truncate_quartile = truncate_quartile

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        var = self.scale[0, 0] ** 2
        norm_const = -0.5 * self.dim * jnp.log(2.0 * jnp.pi * var)
        norm_const += self.log_norm_const
        sq_sum = jnp.sum((x - self.loc[0, 0]) ** 2, axis=-1, keepdims=True)
        return norm_const - 0.5 * sq_sum / var

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        return (self.loc[0, 0] - x) / self.scale[0, 0] ** 2

    def marginal(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x = jnp.asarray(x).reshape(-1, 1)
        z = (x - self.loc[0, 0]) / self.scale[0, 0]
        return jnp.exp(-0.5 * z**2) / (
            self.scale[0, 0] * jnp.sqrt(2.0 * jnp.pi)
        )

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        if self.truncate_quartile is None:
            eps = jax.random.normal(key, (*shape, self.dim))
            return self.loc[0, 0] + self.scale[0, 0] * eps
        lower, upper = self.truncate_quartile
        loc, scale = self.loc[0, 0], self.scale[0, 0]
        eps = jax.random.truncated_normal(
            key,
            (lower - loc) / scale,
            (upper - loc) / scale,
            (*shape, self.dim),
        )
        return loc + scale * eps
