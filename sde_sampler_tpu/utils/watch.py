"""Model watcher: per-submodule gradient / parameter statistics.

TPU-native analogue of the reference's wandb gradient watcher
(reference conf/utils/model_watcher.yaml + solver/base.py:318-319, which
calls ``wandb.watch(models, log="gradients", log_freq=...)``). Framework
backward hooks do not exist for jitted JAX programs, so instead the watcher
computes per-top-level-module gradient and parameter L2 norms INSIDE the
jitted train step — a handful of scalar reductions that XLA fuses into the
step program — and surfaces them through the standard metrics path
(metrics.jsonl + the wandb shim). Values therefore appear at every log
boundary; ``log_freq`` additionally thins them to steps that are multiples
of it (the reference's wandb.watch cadence knob).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ModelWatcher"]


def _l2_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    total = jnp.zeros(())
    for leaf in leaves:
        total = total + jnp.sum(jnp.square(leaf))
    return jnp.sqrt(total)


class ModelWatcher:
    """Collects watch metrics for the train-step metrics dict.

    Args:
        log: "gradients" (default), "parameters", or "all" — mirrors
            wandb.watch's ``log`` argument.
        log_freq: only attach metrics on steps divisible by this (None =
            every step; cadence is then the solver's log_interval).
    """

    def __init__(self, log: str = "gradients", log_freq: int | None = None):
        if log not in ("gradients", "parameters", "all"):
            raise ValueError(f"unknown watch log mode: {log!r}")
        self.log = log
        self.log_freq = int(log_freq) if log_freq else None

    def should_log(self, step: int) -> bool:
        return self.log_freq is None or step % self.log_freq == 0

    def metrics(self, params, grads) -> dict[str, jnp.ndarray]:
        out: dict[str, jnp.ndarray] = {}
        if self.log in ("gradients", "all"):
            for name, sub in grads.items():
                out[f"watch/grad_norm/{name}"] = _l2_norm(sub)
        if self.log in ("parameters", "all"):
            for name, sub in params.items():
                out[f"watch/param_norm/{name}"] = _l2_norm(sub)
        return out
