"""Shared small utilities: results container, timestep grids, clipping.

Capability parity with /root/reference/sde_sampler/utils/common.py
(`Results`, `get_timesteps` with uniform/quad/cosine spacing, `clip_and_log`),
re-built on jax.numpy with static shapes suitable for `lax.scan` rollouts.
"""
from __future__ import annotations

import math
from collections import namedtuple

import jax.numpy as jnp

_ResultsBase = namedtuple(
    "Results",
    "samples weights log_norm_const_preds expectation_preds ts xs metrics plots",
)

_UNSET = object()


class Results(_ResultsBase):
    """Eval results container (reference utils/common.py:9-13).

    Dict-valued fields get a FRESH dict per instance: namedtuple
    ``defaults`` are evaluated once, so a shared ``{}`` default would leak
    in-place mutations (``results.plots.update(...)``) into every later
    Results built without that kwarg."""

    __slots__ = ()

    def __new__(
        cls,
        samples=_UNSET,
        weights=_UNSET,
        log_norm_const_preds=None,
        expectation_preds=None,
        ts=None,
        xs=None,
        metrics=_UNSET,
        plots=_UNSET,
    ):
        return super().__new__(
            cls,
            {} if samples is _UNSET else samples,
            {} if weights is _UNSET else weights,
            log_norm_const_preds,
            expectation_preds,
            ts,
            xs,
            {} if metrics is _UNSET else metrics,
            {} if plots is _UNSET else plots,
        )

CKPT_DIR = "ckpt"


def get_timesteps(
    start: float,
    end: float,
    dt: float | None = None,
    steps: int | None = None,
    rescale_t: str | None = None,
    device=None,  # accepted for config-surface parity; unused in JAX
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Return a (steps+1,) monotone time grid from start to end.

    Spacings: None (uniform), "quad" (sqrt of uniform grid on squared times)
    and "cosine" (DDS cos^4 schedule, reference utils/common.py:36-54).
    """
    import numpy as np

    if (steps is None) is (dt is None):
        raise ValueError("Exactly one of `dt` and `steps` should be defined.")
    if steps is None:
        steps = int(math.ceil((end - start) / dt))
    # Grids are setup-time constants: build them in float64 numpy so the
    # cosine-schedule cumsum stays strictly monotone, then cast.
    if rescale_t is None:
        grid = np.linspace(start, end, steps + 1)
    elif rescale_t == "quad":
        grid = np.clip(
            np.sqrt(np.linspace(start, end**2, steps + 1)), None, end
        )
    elif rescale_t == "cosine":
        s = 0.008  # shift from the original cosine-schedule paper
        pre_phase = np.linspace(start, end, steps + 1) / end
        phase = ((pre_phase + s) / (1 + s)) * np.pi * 0.5
        dts = np.cos(phase) ** 4
        dts = dts / dts.sum() * end
        grid = np.concatenate([[start], start + np.cumsum(dts)])
    else:
        raise ValueError("Unknown timestep rescaling method.")
    return jnp.asarray(grid, dtype=dtype)


def clip_norm(tensor: jnp.ndarray, max_norm: float | None) -> jnp.ndarray:
    """Elementwise clip to [-max_norm, max_norm] (no-op when None).

    The reference pairs clipping with throttled wandb max-abs logging
    (utils/common.py:58-85); inside a jitted scan we keep the clip pure and
    surface clip statistics through the solver's metric stream instead.
    """
    if max_norm is None:
        return tensor
    return jnp.clip(tensor, -max_norm, max_norm)
