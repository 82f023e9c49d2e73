"""Pallas TPU kernels for streamed log-domain Sinkhorn iterations.

This is the TPU-native replacement for the pykeops LazyTensor reductions the
reference uses (/root/reference/sde_sampler/eval/sinkhorn.py:112-178): the
N x M distance matrix is never materialized in HBM. A 2-D grid streams
(row-block x col-chunk) tiles through VMEM; an online logsumexp lives in
VMEM scratch carried across the column grid dimension (TPU grids execute
sequentially, minor dimension fastest), and pairwise distances come from an
MXU dot (|x|^2 + |y|^2 - 2 x.y^T).

Round-1 post-mortem (why the first version wedged the chip): it pinned the
ENTIRE y array in VMEM via a full-height BlockSpec. With d=2..10 the lane
dimension pads to 128, so a (100k, 2) resident block occupies ~51MB of
~16MB VMEM. This version streams y in (COL_CHUNK, d) tiles via the grid
pipeline instead — peak VMEM is a few MB regardless of n.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256
COL_CHUNK = 2048
# a (COL_CHUNK, d<=128) f32 tile is ~1MB after lane padding; double-buffered
# by the pipeline => comfortably inside VMEM for any n
MAX_LANE_D = 128


def _neg_dist_tile(x, y_c, hi_prec=False):
    """-|x_i - y_j| for a (R, d) x (C, d) tile, via the MXU.

    hi_prec (the d=1-padded path): run the dot at Precision.HIGHEST
    (6-pass f32-exact on the MXU). The DEFAULT bf16 passes are UNUSABLE
    for d=1 — dense 1-D point sets have nearest-neighbor distances far
    below the bf16 cancellation floor of x^2 + y^2 - 2xy (the round-5
    staged probe measured 6.9e-2 softmin error vs 8e-5 in interpret
    mode). At f32 precision the cancellation floor is ~2e-4, matching
    the chunked-XLA evaluator's own hardware accuracy. The d >= 2
    default path is untouched (hardware-validated bit parity with XLA).

    (A pure-VPU |x - y^T| broadcast variant was tried first — exact to
    1e-6 and parity-green at probe shapes, but the (R,1) lane-broadcast
    hangs Mosaic at the 100k bench grid; see the round-5 notes.)"""
    x_sq = (x * x).sum(axis=-1, keepdims=True)
    y_sq = (y_c * y_c).sum(axis=-1)
    sq = (
        x_sq
        + y_sq[None, :]
        - 2.0 * jnp.dot(
            x, y_c.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST if hi_prec else None,
        )
    )
    return -jnp.sqrt(jnp.maximum(sq, 0.0))


def _softmin_kernel(
    x_ref, y_ref, v_ref, out_ref, m_scr, s_scr, *, eps, n_col_chunks,
    hi_prec=False,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    z = (_neg_dist_tile(x_ref[:], y_ref[:], hi_prec) + v_ref[:]) / eps
    m_run, s_run = m_scr[:], s_scr[:]
    m_new = jnp.maximum(m_run, z.max(axis=1, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_scr[:] = s_run * jnp.exp(m_run - m_safe) + jnp.exp(z - m_safe).sum(
        axis=1, keepdims=True
    )
    m_scr[:] = m_new

    @pl.when(j == n_col_chunks - 1)
    def _finalize():
        out_ref[:] = m_scr[:] + jnp.log(s_scr[:])


def _transport_kernel(
    x_ref, y_ref, u_ref, v_ref, out_ref, acc_scr, *, eps, n_col_chunks,
    hi_prec=False,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    neg_dist = _neg_dist_tile(x_ref[:], y_ref[:], hi_prec)  # (R, C)
    plan = jnp.exp((neg_dist + u_ref[:] + v_ref[:]) / eps)
    acc_scr[:] = acc_scr[:] + (plan * (-neg_dist)).sum(
        axis=1, keepdims=True
    )

    @pl.when(j == n_col_chunks - 1)
    def _finalize():
        out_ref[:] = acc_scr[:]


def _pad_to(arr, multiple, axis=0, fill=0.0):
    pad = (-arr.shape[axis]) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)


# Flip to True ONLY after the d=1 path has passed the staged hardware
# protocol (bin/pallas_probe.sh --d1: single-program, then gridded parity,
# then bench) on a real chip. History:
#   * round 3: the first d=1 launch (dw_shift 100k eval) wedged the chip
#     AND killed the relay — the degenerate (R, 1) x (1, C) contracted-dim
#     MXU dot was the suspected trigger.
#   * round 5: the zero-column-padding fix (pad d=1 to d=2, keep the MXU
#     quadratic form) launched CLEANLY on hardware (no wedge) but FAILED
#     parity: softmin error 6.9e-2 vs XLA (8e-5 in interpret mode). Root
#     cause: the MXU dot runs in bf16 passes, and d=1 nearest-neighbor
#     distances sit far below the bf16 cancellation floor of the
#     quadratic form, while XLA lowers the (R,1)x(1,C) contraction as an
#     exact f32 broadcast multiply.
#   * round 5 second attempt: a pure-VPU |x - y^T| broadcast (y shipped
#     as a (1, M) row) — exact to 1e-6 vs f64 and parity-green at the
#     single/grid probe shapes, but HANGS Mosaic at the 100k bench grid
#     (host blocked >12 min with idle CPU; small grids of the identical
#     block shapes complete fine). Killed per protocol, chip stayed
#     healthy.
#   * current fix: zero-column padding to d=2 + Precision.HIGHEST on the
#     in-kernel dot (6-pass f32-exact MXU) — cancellation floor drops to
#     ~2e-4, within the 1e-3 f64 bar and matching the chunked-XLA
#     evaluator's own hardware accuracy.
#   * 2026-08-19 05:22 UTC: ALL THREE staged probes PASSED on hardware
#     (results/r5/pallas_d1_probe.log): single_d1 1.4e-4 vs f64, grid_d1
#     1.9e-4, bench_d1 100k^2 softmin 6.0e-5 vs f64 (XLA path: 6.6e-5 —
#     pallas is the MORE accurate side) and full 20-iter Sinkhorn 7.0 s
#     vs 9.5 s chunked XLA (1.36x; the d>=2 9.4x does NOT carry over —
#     XLA lowers the degenerate d=1 contraction as an efficient f32
#     broadcast, so there is far less to win). Gate flipped per protocol.
D1_HARDWARE_VALIDATED = True


def pallas_applicable(n: int, m: int, d: int, p: int) -> bool:
    d_min = 1 if D1_HARDWARE_VALIDATED else 2
    return p == 2 and d_min <= d <= MAX_LANE_D


def _grid_call(kernel, x, y, row_vecs, col_vecs, *, eps, interpret):
    """Shared 2-D-grid launch: row_vecs are (n,1)-blocked per row block,
    col_vecs are (1,COL_CHUNK)-blocked per col chunk."""
    hi_prec = x.shape[1] == 1
    if hi_prec:
        # Zero-column padding to d=2: |x_i - y_j| is unchanged (the extra
        # coordinate contributes 0 to the squared sum) and the in-kernel
        # MXU dot gets a non-degenerate contracted dim. The dot runs at
        # Precision.HIGHEST on this path — see _neg_dist_tile and the
        # D1_HARDWARE_VALIDATED note.
        x = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
        y = jnp.concatenate([y, jnp.zeros_like(y)], axis=1)
    n, d = x.shape
    x_pad = _pad_to(x, ROW_BLOCK)
    y_pad = _pad_to(y, COL_CHUNK)
    n_row_blocks = x_pad.shape[0] // ROW_BLOCK
    n_col_chunks = y_pad.shape[0] // COL_CHUNK

    vmem = pltpu.VMEM if hasattr(pltpu, "VMEM") else None
    kw = {"memory_space": vmem} if vmem is not None else {}
    in_specs = [
        pl.BlockSpec((ROW_BLOCK, d), lambda i, j: (i, 0), **kw),
        pl.BlockSpec((COL_CHUNK, d), lambda i, j: (j, 0), **kw),
    ]
    args = [x_pad, y_pad]
    for vec in row_vecs:
        in_specs.append(
            pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0), **kw)
        )
        args.append(_pad_to(vec.reshape(-1, 1), ROW_BLOCK, fill=-jnp.inf))
    for vec in col_vecs:
        in_specs.append(
            pl.BlockSpec((1, COL_CHUNK), lambda i, j: (0, j), **kw)
        )
        args.append(
            _pad_to(vec.reshape(1, -1), COL_CHUNK, axis=1, fill=-jnp.inf)
        )

    out = pl.pallas_call(
        partial(kernel, eps=eps, n_col_chunks=n_col_chunks,
                hi_prec=hi_prec),
        grid=(n_row_blocks, n_col_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda i, j: (i, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, 1), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, 1), jnp.float32),
        ]
        if kernel is _softmin_kernel
        else [pltpu.VMEM((ROW_BLOCK, 1), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:n, 0]


@partial(jax.jit, static_argnames=("eps", "interpret"))
def softmin_pallas(x, y, dual, eps: float, interpret: bool = False):
    """eps * logsumexp_j((-|x_i - y_j| + dual_j)/eps) for all rows i."""
    lse = _grid_call(
        _softmin_kernel, x, y, (), (dual,), eps=eps, interpret=interpret
    )
    return eps * lse


@partial(jax.jit, static_argnames=("eps", "interpret"))
def transport_cost_pallas(x, y, u, v, eps: float, interpret: bool = False):
    """sum_ij exp((-M_ij + u_i + v_j)/eps) * M_ij, streamed."""
    per_row = _grid_call(
        _transport_kernel, x, y, (u,), (v,), eps=eps, interpret=interpret
    )
    return per_row.sum()
