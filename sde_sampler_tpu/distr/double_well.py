"""Double-well and product multi-well targets.

Parity with /root/reference/sde_sampler/distr/double_well.py: 1-d quartic
well exp(-(x²-separation)²) with analytic score, GMM-proposal rejection
sampling, and MultiWell = (k double wells) ⊗ (d-k standard Gaussians) with
factorized statistics.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Distribution, rejection_sampling
from .gauss import GMM, IsotropicGauss


class DoubleWell(Distribution):
    def __init__(
        self,
        dim: int = 1,
        separation: float = 2.0,
        shift: float = 0.0,
        grid_points: int = 2001,
        rejection_sampling_scaling: float = 3.0,
        domain_delta: float = 2.5,
        **kwargs,
    ):
        if not dim == 1:
            raise ValueError("`dim` needs to be `1`. Consider using `MultiWell`.")
        super().__init__(dim=1, grid_points=grid_points, **kwargs)
        self.rejection_sampling_scaling = rejection_sampling_scaling
        self.separation = float(separation)
        self.shift = float(shift)

        if self.domain is None:
            half_width = math.sqrt(self.separation) + domain_delta
            self.set_domain(
                self.shift + half_width * jnp.asarray([[-1.0, 1.0]])
            )

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x - self.shift
        return -((x**2 - self.separation) ** 2)

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x = x - self.shift
        return -4.0 * (x**2 - self.separation) * x

    def marginal(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        return self.pdf(x)

    def get_proposal_distr(self) -> GMM:
        root = math.sqrt(self.separation)
        loc = self.shift + root * jnp.asarray([[-1.0], [1.0]])
        scale = (1.0 / root) * jnp.ones((2, 1))
        return GMM(
            dim=1, loc=loc, scale=scale, mixture_weights=jnp.ones(2),
            domain_tol=None,
        )

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        return rejection_sampling(
            key,
            shape=shape,
            target=self,
            proposal=self.get_proposal_distr(),
            scaling=self.rejection_sampling_scaling,
        )

    def plots(self, samples, nbins: int = 100) -> dict:
        """Rejection-sampling diagnostic: histogram vs scaled proposal."""
        import numpy as np

        from sde_sampler_tpu.eval.plots import plot_marginal

        gt = self.sample(jax.random.PRNGKey(0), (samples.shape[0],))
        fig = plot_marginal(
            x=gt,
            marginal=lambda x, **kw: self.pdf(jnp.asarray(x)),
            dim=0,
            nbins=nbins,
            domain=self.domain,
        )
        ax = fig.axes[0]
        x = np.linspace(*np.asarray(self.domain)[0], nbins)
        y = (
            np.asarray(self.get_proposal_distr().pdf(jnp.asarray(x[:, None])))
            * self.rejection_sampling_scaling
        )
        ax.plot(x, y.squeeze(-1), "r--", label="proposal")
        ax.legend()
        return {"plots/rejection_sampling": fig}


class MultiWell(Distribution):
    """Product of `n_double_wells` quartic wells and (d-k) unit Gaussians."""

    def __init__(
        self,
        dim: int = 2,
        n_double_wells: int = 1,
        separation: float = 2.0,
        shift: float = 0.0,
        domain_dw_delta: float = 2.5,
        domain_gauss_scale: float = 5.0,
        **kwargs,
    ):
        super().__init__(dim=dim, **kwargs)
        self.separation = separation
        if n_double_wells > dim or n_double_wells == 0:
            raise ValueError(f"Please specify between 1 and {dim} double wells.")
        self.n_double_wells = n_double_wells
        self.n_gauss = self.dim - self.n_double_wells

        self.double_well = DoubleWell(
            separation=separation, shift=shift, domain_delta=domain_dw_delta
        )
        domain = jnp.tile(self.double_well.domain, (self.n_double_wells, 1))
        self.gauss = None
        if self.n_gauss > 0:
            self.gauss = IsotropicGauss(
                dim=self.n_gauss,
                loc=shift,
                log_norm_const=0.5 * math.log(2.0 * math.pi) * self.n_gauss,
                domain_scale=domain_gauss_scale,
            )
            domain = jnp.concatenate([domain, self.gauss.domain])
        self.set_domain(domain)

    def compute_stats(self, key: jax.Array | None = None):
        self.double_well.compute_stats()
        self.log_norm_const = (
            self.double_well.log_norm_const * self.n_double_wells
        )
        self.expectations = {
            name: exp * self.n_double_wells
            for name, exp in self.double_well.expectations.items()
        }
        self.stddevs = jnp.concatenate(
            [self.double_well.stddevs] * self.n_double_wells
        )
        if self.gauss is not None:
            self.gauss.compute_stats()
            self.log_norm_const += self.gauss.log_norm_const
            for name in self.expectations:
                # Expectation fns reduce over dims via a sum, so they add.
                self.expectations[name] += self.gauss.expectations[name]
            self.stddevs = jnp.concatenate([self.stddevs, self.gauss.stddevs])
        assert (self.pdf(self.domain.T) < 1e-5).all()

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        log_prob = self.double_well.unnorm_log_prob(
            x[:, : self.n_double_wells]
        ).sum(axis=-1, keepdims=True)
        if self.gauss is not None:
            log_prob += self.gauss.unnorm_log_prob(x[:, self.n_double_wells:])
        return log_prob

    def score(self, x: jnp.ndarray, **kwargs) -> jnp.ndarray:
        score = self.double_well.score(x[:, : self.n_double_wells])
        if self.gauss is not None:
            score_gauss = self.gauss.score(x[:, self.n_double_wells:])
            score = jnp.concatenate([score, score_gauss], axis=-1)
        return score

    def marginal(self, x: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
        if dim < self.n_double_wells:
            return self.double_well.marginal(x)
        return self.gauss.marginal(x)

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        key_dw, key_gauss = jax.random.split(key)
        samples = self.double_well.sample(
            key_dw, shape + (self.n_double_wells,)
        ).squeeze(-1)
        if self.gauss is not None:
            samples_gauss = self.gauss.sample(key_gauss, shape)
            samples = jnp.concatenate([samples, samples_gauss], axis=-1)
        return samples
