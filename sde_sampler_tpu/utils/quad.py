"""Vectorized Boole's-rule grid quadrature (torchquad.Boole equivalent).

Used by distributions to compute reference statistics (normalization
constants, expectations, stddevs) on their domain boxes, replacing the
torchquad dependency of the reference (distr/base.py:62-85). Evaluation is
chunked with `jax.lax.map` so multi-million-point 2-d grids stream through
device memory instead of materializing at once.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

_BOOLE_W = jnp.asarray([7.0, 32.0, 12.0, 32.0, 7.0]) * 2.0 / 45.0


def _points_per_dim(n_total: int, dim: int) -> int:
    """Largest per-dim count m with m**dim <= n_total and (m-1) % 4 == 0."""
    m = int(round(n_total ** (1.0 / dim)))
    m = max(m, 5)
    # snap to 4k+1
    if (m - 1) % 4 != 0:
        m = m + (4 - (m - 1) % 4)
    return m


def _boole_weights_1d(m: int, h: float) -> jnp.ndarray:
    """Composite Boole weights for m=4k+1 points with spacing h."""
    w = jnp.zeros(m)
    n_panels = (m - 1) // 4
    for p in range(n_panels):
        w = w.at[4 * p : 4 * p + 5].add(_BOOLE_W)
    return w * h


def integrate(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    dim: int,
    N: int,
    integration_domain: jnp.ndarray,
    chunk: int = 1 << 18,
) -> jnp.ndarray:
    """Integrate fn over the box `integration_domain` ((dim, 2) array).

    fn maps (B, dim) -> (B,) or (B, 1) or (B, k); returns scalar (or (k,)).
    """
    domain = jnp.asarray(integration_domain, dtype=jnp.float32)
    assert domain.shape == (dim, 2)
    m = _points_per_dim(N, dim)

    grids, weights = [], []
    for d in range(dim):
        a, b = float(domain[d, 0]), float(domain[d, 1])
        h = (b - a) / (m - 1)
        grids.append(jnp.linspace(a, b, m))
        weights.append(_boole_weights_1d(m, h))

    if dim == 1:
        x = grids[0][:, None]
        w = weights[0]
    else:
        mesh = jnp.meshgrid(*grids, indexing="ij")
        x = jnp.stack([g.reshape(-1) for g in mesh], axis=-1)
        wmesh = jnp.meshgrid(*weights, indexing="ij")
        w = math.prod(wmesh) if dim == 1 else jnp.ones(())
        w = wmesh[0]
        for d in range(1, dim):
            w = w * wmesh[d]
        w = w.reshape(-1)

    n_pts = x.shape[0]
    if n_pts <= chunk:
        vals = jnp.atleast_2d(fn(x))
        if vals.shape[0] != n_pts:  # (n_pts,) was broadcast to (1, n_pts)
            vals = vals.T
        return jnp.squeeze((w[:, None] * vals.reshape(n_pts, -1)).sum(axis=0))

    # Stream in fixed-size chunks (pad the tail with zero weight)
    n_chunks = -(-n_pts // chunk)
    pad = n_chunks * chunk - n_pts
    x_pad = jnp.pad(x, ((0, pad), (0, 0)))
    w_pad = jnp.pad(w, (0, pad))
    x_chunks = x_pad.reshape(n_chunks, chunk, dim)
    w_chunks = w_pad.reshape(n_chunks, chunk)

    def body(args):
        xc, wc = args
        vals = fn(xc).reshape(chunk, -1)
        return (wc[:, None] * vals).sum(axis=0)

    partials = jax.lax.map(body, (x_chunks, w_chunks))
    return jnp.squeeze(partials.sum(axis=0))
