"""Rosenbrock global-optimization target.

Parity with /root/reference/sde_sampler/distr/rosenbrock.py: density
exp(-rosenbrock(x)/flatness) with an `objective` hook so evaluation logs
min/avg objective values.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .base import Distribution


class Rosenbrock(Distribution):
    def __init__(self, dim: int = 5, flatness: float = 1.0, scale: float = 1.0):
        super().__init__(dim=dim)
        self.flatness = float(flatness)
        self.scale = float(scale)

    @staticmethod
    def objective(x: jnp.ndarray) -> jnp.ndarray:
        return (
            100 * (x[:, 1:] - x[:, :-1] ** 2) ** 2 + (1 - x[:, :-1]) ** 2
        ).sum(axis=-1, keepdims=True)

    def unnorm_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return -Rosenbrock.objective(x) / self.flatness + math.log(self.scale)
