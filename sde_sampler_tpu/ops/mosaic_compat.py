"""Mosaic-compatible substitutes for primitives Pallas TPU cannot lower.

The fused rollout kernel (ops/rollout_pallas.py) traces arbitrary model
code into a Mosaic kernel. Mosaic has no erf/erfc lowering, so the exact
GELU (torch parity, models/mlp.py) cannot be used verbatim inside a
kernel. While `mosaic_trace()` is active, `gelu_exact` switches to a
polynomial erf (Abramowitz & Stegun 7.1.26, max abs error 1.5e-7 — far
below the 1e-4 kernel-parity tolerance); everywhere else it is the stock
`jax.nn.gelu(approximate=False)` so recorded numerics are untouched.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

_mosaic_tracing = contextvars.ContextVar("mosaic_tracing", default=False)


@contextlib.contextmanager
def mosaic_trace():
    """Activate Mosaic-safe substitutes for the enclosed trace."""
    token = _mosaic_tracing.set(True)
    try:
        yield
    finally:
        _mosaic_tracing.reset(token)


def in_mosaic_trace() -> bool:
    return _mosaic_tracing.get()


def erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU; polynomial-erf variant inside Mosaic traces."""
    if in_mosaic_trace():
        inv_sqrt2 = jnp.asarray(0.7071067811865476, dtype=x.dtype)
        return 0.5 * x * (1.0 + erf_poly(x * inv_sqrt2))
    return jax.nn.gelu(x, approximate=False)
