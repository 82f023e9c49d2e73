"""Debug setup hooks (conf/utils/debug.yaml).

The reference enables torch.autograd anomaly detection through its `setup`
hook list (solver/base.py:39-41); the JAX analogues are nan-debugging and
disabled jit.
"""
from __future__ import annotations

import jax


def enable_debug_nans(mode: bool = True):
    jax.config.update("jax_debug_nans", mode)


def disable_jit(mode: bool = True):
    jax.config.update("jax_disable_jit", mode)
