"""Staged hardware validation of the Pallas Sinkhorn kernels.

Run each stage as its own subprocess with a timeout (bin/pallas_probe.sh);
a hang in any stage must NOT be retried in a loop — a crashed Mosaic kernel
wedges the tunneled TPU for 15-90 min (CLAUDE.md). Stages:

    1 single   grid=(1,1) launch, tiny shapes, compare vs the XLA path
    2 grid     multi-block grid, medium shapes, compare vs the XLA path
    3 bench    100k x 100k softmin + full Sinkhorn timing vs the XLA path

d=1 stages (single_d1 / grid_d1 / bench_d1) validate the d=1 path
(zero-column padding + Precision.HIGHEST dot — see the full attempt
history at D1_HARDWARE_VALIDATED in ops/sinkhorn_pallas.py: raw d=1
wedged the chip in round 3; default-precision padding failed parity to
bf16 MXU cancellation; the pure-VPU broadcast hung Mosaic at the 100k
grid). d=1 stages assert against host f64 ground truth, which also
adjudicates whether the XLA path itself is accurate on hardware. All
three stages must pass before D1_HARDWARE_VALIDATED may be flipped
(never flip first).

Usage: python scripts/pallas_probe.py <stage>
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sde_sampler_tpu.utils.device import ensure_cpu_backend  # noqa: E402

ensure_cpu_backend()

import numpy as np  # noqa: E402


def _data(n, m, d, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(m, d)) + 0.3, jnp.float32)
    dual = jnp.asarray(rng.normal(size=(m,)) * 0.01, jnp.float32)
    return x, y, dual


def _f64_truth(x, y, dual, u, eps):
    """Host float64 ground truth for softmin + transport (small shapes).

    The correctness anchor for the d=1 stages: the round-5 probe showed
    6.9e-2 pallas-vs-XLA softmin disagreement on hardware, and a
    two-sided hardware comparison cannot tell WHICH side is wrong — the
    bf16 MXU quadratic form fails for d=1 nearest-neighbor distances, and
    whether XLA's (R,1)x(1,C) lowering shares that failure is a lowering
    detail we must not assume. f64 on host adjudicates."""
    xd, yd = np.asarray(x, np.float64), np.asarray(y, np.float64)
    dd, ud = np.asarray(dual, np.float64), np.asarray(u, np.float64)
    dist = np.sqrt(((xd[:, None, :] - yd[None, :, :]) ** 2).sum(-1))
    z = (-dist + dd[None, :]) / eps
    zmax = z.max(axis=1, keepdims=True)
    softmin = eps * (
        np.log(np.exp(z - zmax).sum(axis=1)) + zmax[:, 0]
    )
    plan = np.exp((-dist + ud[:, None] + dd[None, :]) / eps)
    transport = float((plan * dist).sum())
    return softmin, transport


def _compare(n, m, d):
    import jax.numpy as jnp
    import numpy as np_

    from sde_sampler_tpu.eval.sinkhorn import _softmin, _transport_cost
    from sde_sampler_tpu.ops import sinkhorn_pallas as sp
    from sde_sampler_tpu.utils.device import sync

    x, y, dual = _data(n, m, d)
    u = jnp.asarray(
        np_.random.default_rng(1).normal(size=(n,)) * 0.01, jnp.float32
    )
    eps = 1e-2
    f64_softmin, f64_transport = _f64_truth(x, y, dual, u, eps)
    print(f"launching pallas softmin n={n} m={m} d={d} ...", flush=True)
    pal = sp.softmin_pallas(x, y, dual, eps)
    sync(pal)  # real barrier (block_until_ready is a no-op on the relay)
    print("pallas done; launching XLA reference ...", flush=True)
    ref = _softmin(
        x, y, dual, eps, p=2,
        row_chunk=min(1024, n), col_chunk=min(8192, m),
    )
    diff = float(jnp.abs(ref - pal).max())
    pal_f64 = float(np_.abs(np_.asarray(pal) - f64_softmin).max())
    ref_f64 = float(np_.abs(np_.asarray(ref) - f64_softmin).max())
    print(f"softmin max abs diff vs XLA: {diff:.3e} "
          f"(pallas vs f64: {pal_f64:.3e}, xla vs f64: {ref_f64:.3e})")
    # f64 is the primary correctness bar; the XLA cross-check stays a
    # hard assert only where both sides compute identical arithmetic
    # (d >= 2, hardware-validated bit parity)
    assert pal_f64 < 1e-3, "pallas softmin wrong vs f64 truth"
    if d >= 2:
        assert diff < 1e-3, "pallas softmin mismatch"

    # the transport kernel must be launched by the staged probe too —
    # both kernels go to production when the stage gate passes
    print("launching pallas transport cost ...", flush=True)
    pal_t = sp.transport_cost_pallas(x, y, u, dual, eps)
    sync(pal_t)
    ref_t = _transport_cost(
        x, y, u, dual, eps, p=2,
        row_chunk=min(1024, n), col_chunk=min(8192, m),
    )
    rel_t = abs(float(pal_t) - float(ref_t)) / max(abs(float(ref_t)), 1e-12)
    rel_pal_f64 = abs(float(pal_t) - f64_transport) / max(
        abs(f64_transport), 1e-12
    )
    rel_ref_f64 = abs(float(ref_t) - f64_transport) / max(
        abs(f64_transport), 1e-12
    )
    print(f"transport rel diff vs XLA: {rel_t:.3e} "
          f"(pallas vs f64: {rel_pal_f64:.3e}, xla vs f64: {rel_ref_f64:.3e})")
    assert rel_pal_f64 < 1e-3, "pallas transport wrong vs f64 truth"
    if d >= 2:
        assert rel_t < 1e-4, "pallas transport mismatch"
    print("OK")


def stage_single():
    _compare(256, 2048, 2)


def stage_grid():
    _compare(1024, 8192, 10)


def stage_single_d1():
    _compare(256, 2048, 1)


def stage_grid_d1():
    _compare(1024, 8192, 1)


def _bench(d: int):
    from sde_sampler_tpu.eval.sinkhorn import Sinkhorn, _softmin
    from sde_sampler_tpu.ops import sinkhorn_pallas as sp
    from sde_sampler_tpu.utils.device import sync

    if d < 2:
        # The whole point of bench_d1 is to exercise the padded d=1
        # kernels end-to-end; with the production gate still closed the
        # 'pallas' Sinkhorn would silently route to XLA and the parity
        # check would compare XLA with itself. Open the gate IN THIS
        # PROCESS ONLY — the committed flag flips only after all three
        # d1 stages pass on hardware.
        sp.D1_HARDWARE_VALIDATED = True

    n = m = 100_000
    x, y, dual = _data(n, m, d)
    eps = 1e-2

    outs = {}
    for name, fn in [
        ("pallas", lambda: sp.softmin_pallas(x, y, dual, eps)),
        ("xla", lambda: _softmin(x, y, dual, eps, p=2,
                                 row_chunk=1024, col_chunk=8192)),
    ]:
        sync(fn())  # compile; sync = real barrier (round-2 finding:
        # block_until_ready returns before relay-queued programs finish)
        t0 = time.time()
        for _ in range(3):
            out = fn()
        sync(out)
        outs[name] = np.asarray(out)
        print(f"softmin[{name}] {n}x{m} d={d}: "
              f"{(time.time() - t0) / 3:.3f}s/iter")

    # subsampled f64 correctness anchor (256 rows x full m, chunked on
    # host) — at d=1 the XLA cross-check alone cannot adjudicate which
    # side is wrong (see _f64_truth)
    rows = np.random.default_rng(2).choice(n, size=256, replace=False)
    xd = np.asarray(x, np.float64)[rows]
    yd, dd = np.asarray(y, np.float64), np.asarray(dual, np.float64)
    sm64 = np.empty(len(rows))
    for i in range(0, len(rows), 64):
        dist = np.sqrt(
            ((xd[i:i + 64, None, :] - yd[None, :, :]) ** 2).sum(-1)
        )
        z = (-dist + dd[None, :]) / eps
        zmax = z.max(axis=1, keepdims=True)
        sm64[i:i + 64] = eps * (
            np.log(np.exp(z - zmax).sum(axis=1)) + zmax[:, 0]
        )
    for name, arr in outs.items():
        err = float(np.abs(arr[rows] - sm64).max())
        print(f"softmin[{name}] vs f64 (256-row subsample): {err:.3e}")
        if name == "pallas":
            assert err < 1e-3, "pallas softmin wrong vs f64 truth"

    vals = {}
    for backend in ("xla", "pallas"):
        sk = Sinkhorn(p=2, eps=1e-3, max_iters=20, backend=backend)
        routed = sk._use_pallas(x, y)
        if backend == "pallas":
            assert routed, (
                "Sinkhorn(backend='pallas') did not route to the pallas "
                "kernels — the parity check below would be vacuous"
            )
        t0 = time.time()
        vals[backend] = float(sk(x, y))
        print(f"sinkhorn[{backend}] 20 iters: {time.time() - t0:.1f}s "
              f"value={vals[backend]:.4f} (pallas routed: {routed})")
    diff = abs(vals["pallas"] - vals["xla"])
    rel = diff / max(abs(vals["xla"]), 1e-12)
    if d < 2:
        # The Sinkhorn divergence is a near-cancelling difference of
        # transport costs, so for same-distribution clouds its value sits
        # near zero and RELATIVE parity on it is ill-conditioned: each
        # constituent softmin carries the ~6e-5 hardware f32 floor
        # measured by the f64 subsample above (where pallas at
        # Precision.HIGHEST was the MORE accurate side), and those floors
        # do not cancel between two different lowerings. The first
        # HIGHEST-precision hardware run measured |Δ|=4.9e-6 on a 1.1e-3
        # value (rel 4.4e-3) with BOTH paths 6e-5-true per softmin — an
        # absolute bar at 1e-4 is the conditioning-correct gate; f64
        # remains the correctness anchor.
        assert diff < 1e-4, (
            f"pallas/xla sinkhorn mismatch: {vals} (abs {diff:.2e})"
        )
    else:
        # d>=2: both sides run identical arithmetic — demand parity.
        assert rel < 1e-5, (
            f"pallas/xla sinkhorn mismatch: {vals} (rel {rel:.2e})"
        )


def stage_bench():
    _bench(10)


def stage_bench_d1():
    _bench(1)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "single"
    {
        "single": stage_single,
        "grid": stage_grid,
        "bench": stage_bench,
        "single_d1": stage_single_d1,
        "grid_d1": stage_grid_d1,
        "bench_d1": stage_bench_d1,
    }[stage]()
