"""Device-placement policy for setup-time vs hot-path computation.

On a remote-attached TPU (axon tunnel), every eager op costs a host↔device
round trip, and jit-compiling a function whose closed-over constants live on
the TPU forces the constant values to be pulled back to host first (measured
~20s per small compile vs ~0.4s with host-resident constants). Policy:

- All one-time setup math (distribution constants, timestep grids, parameter
  init, reference statistics) runs on the CPU backend via `host_device()`.
- The resulting arrays are embedded as constants when the hot loops are
  jitted for the TPU; only the TrainState lives on the accelerator
  (`to_accelerator`).

Entry points should extend JAX_PLATFORMS to "axon,cpu" (see
`ensure_cpu_backend`) so the CPU backend co-exists with the TPU.
"""
from __future__ import annotations

import contextlib
import os


def ensure_cpu_backend():
    """Append 'cpu' to JAX_PLATFORMS before jax initializes its backends."""
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms.split(","):
        os.environ["JAX_PLATFORMS"] = platforms + ",cpu"


def relay_dead(port: int = 8082) -> bool:
    """True when the TPU is attached through the axon loopback relay and
    the relay process is gone (nothing listening on its first port).

    A dead relay makes the first device op spin in a connect()-retry loop
    forever (observed 2026-08-17: a Pallas crash took the relay down and
    every subsequent jax process hung until killed). Entry points that the
    driver calls unattended (bench.py, __graft_entry__.entry) check this
    and fail fast with a clear message instead of hanging.

    NOTE: a TCP connect is necessary but NOT sufficient — a half-open
    listener (port accepts, far side gone) still passes. Unattended entry
    points must ALSO gate the first device op behind `device_probe()`
    (watchdog subprocess), the pattern bin/r4_queue.sh uses.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return False
    pool = os.environ.get("PALLAS_AXON_POOL_IPS", "")
    if pool and not pool.startswith("127."):
        # Genuinely remote attachment: the local relay port is meaningless.
        return False
    import socket

    try:
        with socket.create_connection(("127.0.0.1", port), timeout=2):
            return False
    except OSError:
        return True


def device_probe(timeout_s: float = 120.0, _probe_cmd=None) -> bool:
    """True when the accelerator backend actually answers a device query.

    `relay_dead()` only checks that the relay's TCP port accepts — a
    half-open listener (port open, backend gone; the failure mode behind
    MULTICHIP_r03's rc=124) still hangs the first device op forever. This
    runs `jax.devices()` in a WATCHDOG SUBPROCESS with a hard timeout so a
    hung backend costs `timeout_s` instead of the driver's whole budget.

    The subprocess inherits the full env (incl. the axon sitecustomize on
    PYTHONPATH) so it initializes exactly the backend the caller would.
    """
    if _probe_cmd is None and "axon" not in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        return True  # plain CPU/local backend: nothing to probe
    import subprocess
    import sys

    cmd = _probe_cmd or [
        sys.executable, "-c",
        "import jax; print('NDEV', len(jax.devices()))",
    ]
    try:
        result = subprocess.run(
            cmd,
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return result.returncode == 0 and "NDEV" in result.stdout


def host_device():
    """Context manager placing eager computation on the CPU backend."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def accelerator():
    import jax

    return jax.devices()[0]


def to_accelerator(tree):
    """Move a pytree to the default accelerator device."""
    import jax

    return jax.device_put(tree, accelerator())


def sync(tree) -> float:
    """Barrier that REALLY waits for queued device programs to finish.

    On the relay-attached TPU of this environment `jax.block_until_ready`
    returns before queued programs execute (it is a host-queue barrier, not
    a device barrier — round-2 finding that inflated throughput numbers up
    to ~13x). Materializing a scalar on the host is the only reliable
    device barrier, so every timing window must close with this helper.

    IMPORTANT: this must not dispatch any device op — an eager op through
    the relay costs ~0.5-1.5 s (a first version using jnp.ravel()[0] added
    ~1.8 s per 50-step chunk and slowed training 3.6x). Pulling an EXISTING
    buffer (np.asarray / float()) is a plain D2H transfer that waits for
    the producing program — that is the barrier. The smallest leaf is
    pulled so large trees (trajectories, param pytrees) stay on device.

    Accepts any pytree of arrays; returns the first element of the pulled
    leaf as a Python float so callers can also use the value.
    """
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(tree)
    leaf = min(leaves, key=lambda l: getattr(l, "size", 1))
    return float(np.asarray(leaf).ravel()[0])
