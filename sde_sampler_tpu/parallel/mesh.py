"""Device-mesh helpers for data-parallel trajectory batches.

The reference is single-device (SURVEY.md §2.2); this module adds the
TPU-native distributed layer: a 1-D batch mesh over ICI, batch shardings for
rollout states, and replicated shardings for parameters. Loss reductions
(mean / variance of per-sample RND) become single psums inserted by XLA's
SPMD partitioner — no hand-written collectives are needed on this path.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def get_mesh(n_devices: int | None = None) -> Mesh | None:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), (BATCH_AXIS,))


def replicated_sharding(mesh: Mesh | None):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh | None):
    """Constrain a (B, ...) array to be sharded along the batch axis."""
    if mesh is None:
        return x
    spec = P(BATCH_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh | None):
    if mesh is None:
        return tree
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
