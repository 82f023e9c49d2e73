"""Dirac-delta prior approximated by a tiny-scale Gaussian.

Parity with /root/reference/sde_sampler/distr/delta.py (used by the PIS
solver, which requires a point-mass prior).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gauss import Gauss


class Delta(Gauss):
    def __init__(
        self,
        dim: int = 1,
        loc=0.0,
        approx_scale: float = 1e-3,
        domain_scale: float = 10,
        **kwargs,
    ):
        super().__init__(
            dim=dim,
            loc=loc,
            scale=approx_scale,
            domain_scale=domain_scale,
            **kwargs,
        )

    def sample(self, key: jax.Array, shape: tuple | None = None) -> jnp.ndarray:
        shape = tuple(shape or ())
        return jnp.tile(self.loc, (*shape, 1)) if shape else self.loc[0]
