"""Fused EM-rollout simulation kernel (Pallas/Mosaic).

The two-phase LV loss (losses/oc.py) reduces training to a value-only
forward rollout plus one batched differentiable control evaluation. The
rollout is inherently sequential, and under XLA it costs ~25-35 us per EM
step at the flagship shape (batch 2048, d=10, 64-wide control net) — the
per-step FLOPs are <1 us at peak, the rest is per-op overhead on tiny
buffers inside the while-loop body. This kernel runs the ENTIRE rollout
inside one Mosaic launch: grid (batch tiles, steps) with the step
dimension minor (TPU grids execute sequentially), the x carry in VMEM
scratch across step iterations, the control-net parameters resident in
VMEM, and the per-step dbs-in / xs-out HBM blocks double-buffered by the
pallas pipeline. No per-op dispatch between steps.

Generic by construction: the caller passes a jnp-traceable
`step_fn(params, s, t, x, db) -> x_next` (typically built from
`module.apply` + the SDE update) which is traced INTO the kernel, and a
params pytree that is shipped through VMEM refs.

Routing/guards: this kernel is OPT-IN (`loss.sim_backend=pallas`) and
only partially guarded. The loss call sites
(losses/oc.py:_resolve_sim_backend) route to the XLA scan when a mesh is
active, when the body needs per-step PRNG keys, or when d < 2 (the
degenerate (B,1)x(1,w) MXU dot wedged the chip on 2026-08-17);
`fused_sim_rollout` additionally raises on d < 2 and on a batch not
divisible by the resolved tile. A Mosaic-unlowerable primitive in
`step_fn` or a CPU backend without interpret=True still fails at compile
time — there is NO automatic try/except fallback.

Reference behavior being accelerated: the per-step torch loop in
/root/reference/sde_sampler/losses/oc.py:156-230.

VMEM per step iteration (fp32, lane-padded d): ~8 buffers of
(block_b, max(d,128)); block_b is halved automatically until that fits.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sde_sampler_tpu.ops import mosaic_compat

VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # leave headroom below the 16MB core


def _tile_rows(dim: int, batch: int, requested: int) -> int:
    """Largest power-of-two batch tile (<= requested) that fits in VMEM.

    Per-iteration VMEM: ~8 buffers of (block_b, padded_d) fp32 (x0, the
    double-buffered dbs-in and xs-out blocks, the x scratch, slack for
    activations of the in-kernel control net at width<=128).
    """
    block_b = min(requested, batch)
    padded_d = max(dim, 128)
    while block_b > 8:
        if 8 * block_b * padded_d * 4 <= VMEM_BUDGET_BYTES and (
            batch % block_b == 0
        ):
            break
        block_b //= 2
    return block_b


def fused_sim_rollout(
    step_fn: Callable,
    params,
    x0: jnp.ndarray,
    ts: jnp.ndarray,
    dbs: jnp.ndarray,
    *,
    block_b: int = 2048,
    interpret: bool = False,
):
    """Run ``x_{k+1} = step_fn(params, ts[k], ts[k+1], x_k, dbs[k])`` for
    every k inside one Pallas kernel.

    Args:
      step_fn: jnp-traceable pure function; traced into the kernel.
      params: pytree of arrays (weights, clip scalars, ...) — placed in VMEM.
      x0: (B, d) initial states.
      ts: (T+1,) time grid.
      dbs: (T, B, d) pregenerated noise increments.

    Returns:
      (xs, x_T): xs[k] is the state BEFORE step k (matching the scan path's
      ys output), shape (T, B, d); x_T is the terminal state (B, d).
    """
    batch, dim = x0.shape
    if dim < 2:
        raise ValueError(
            "fused_sim_rollout requires d >= 2: a d=1 state makes the "
            "first in-kernel matmul a degenerate (B,1)x(1,w) MXU dot — "
            "the contracted-dim pattern that wedged the chip and killed "
            "the relay on 2026-08-17 (see sinkhorn_pallas."
            "pallas_applicable). Use the XLA scan for d=1; any future "
            "d=1 kernel must pass the staged bin/pallas_probe.sh "
            "protocol before a gridded hardware launch."
        )
    n_steps = ts.shape[0] - 1
    block_b = _tile_rows(dim, batch, block_b)
    if batch % block_b != 0:
        raise ValueError(f"batch {batch} not divisible by tile {block_b}")

    # This rollout is value-only by contract (the two-phase loss
    # differentiates a separate batched re-evaluation) and pallas_call has
    # no JVP rule — sever every incoming tangent up front so autodiff
    # never tries to linearize the kernel.
    x0 = jax.lax.stop_gradient(x0)
    dbs = jax.lax.stop_gradient(dbs)
    ts = jax.lax.stop_gradient(ts)

    # scalars must live in >=2D refs; pack (s, t) pairs as a (T, 2) SMEM array
    ts_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)

    # step_fn typically closes over arrays (score-network constants, SDE
    # coefficients, distribution params). Mosaic kernels cannot capture
    # array constants — trace the step once and hoist the jaxpr consts
    # into explicit kernel inputs (jax.closure_convert only hoists traced
    # captures, not concrete arrays).
    example = (params, ts[0], ts[1], x0[:block_b], dbs[0, :block_b])
    with mosaic_compat.mosaic_trace():
        closed, out_shape_tree = jax.make_jaxpr(step_fn, return_shape=True)(
            *example
        )
    consts = tuple(jnp.asarray(c) for c in closed.consts)
    out_tree = jax.tree_util.tree_structure(out_shape_tree)

    def step_fn(p, s, t, x, db, *const_vals):  # noqa: F811 — converted form
        flat = jax.tree_util.tree_leaves((p, s, t, x, db))
        out = jax.core.eval_jaxpr(closed.jaxpr, list(const_vals), *flat)
        return jax.tree_util.tree_unflatten(out_tree, out)

    params = (params, consts)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_shapes = [jnp.shape(l) for l in leaves]
    # 0-d / 1-d leaves go through as 2-D refs and are reshaped back inside
    leaves2d = [
        jnp.atleast_2d(jax.lax.stop_gradient(jnp.asarray(l)))
        for l in leaves
    ]

    # Grid: (batch tiles, steps) with the STEP dimension minor — the TPU
    # grid executes sequentially, so the x carry lives in a VMEM scratch
    # across step iterations (same pattern as the streaming Sinkhorn
    # kernels, hardware-validated round 2) while the pallas pipeline
    # double-buffers the per-step dbs-in / xs-out HBM blocks around the
    # compute. No manual DMA.
    def kernel(ts_ref, x0_ref, dbs_ref, *rest):
        param_refs = rest[: len(leaves2d)]
        xs_ref, xT_ref, x_scratch = rest[len(leaves2d):]
        vals = [
            r[...].reshape(shape)
            for r, shape in zip(param_refs, leaf_shapes)
        ]
        p, const_vals = jax.tree_util.tree_unflatten(treedef, vals)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            x_scratch[...] = x0_ref[...]

        x = x_scratch[...]
        xs_ref[0] = x
        s = ts_ref[k, 0]
        t = ts_ref[k, 1]
        x_next = step_fn(p, s, t, x, dbs_ref[0], *const_vals)
        x_scratch[...] = x_next

        @pl.when(k == n_steps - 1)
        def _():
            xT_ref[...] = x_next

    grid = (batch // block_b, n_steps)
    broadcast = lambda *shape: pl.BlockSpec(
        shape, lambda b, k: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (n_steps, 2), lambda b, k: (0, 0), memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((block_b, dim), lambda b, k: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, dim), lambda b, k: (k, b, 0),
                     memory_space=pltpu.VMEM),
        *[broadcast(*l.shape) for l in leaves2d],
    ]
    out_specs = [
        pl.BlockSpec((1, block_b, dim), lambda b, k: (k, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, dim), lambda b, k: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_steps, batch, dim), x0.dtype),
        jax.ShapeDtypeStruct((batch, dim), x0.dtype),
    ]
    xs, x_T = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_b, dim), x0.dtype)],
        interpret=interpret,
    )(ts_pairs, x0, dbs, *leaves2d)
    return xs, x_T


def sde_step_fn(apply_ctrl: Callable, drift, diff) -> Callable:
    """Standard controlled-EM update as a kernel step_fn.

    apply_ctrl(params, s, x) -> u; drift(s, x), diff(s, x) from the SDE
    (jnp-traceable, x-shape-preserving or scalar).
    """

    def step(params, s, t, x, db):
        u = apply_ctrl(params, s, x)
        sde_diff = diff(s, x)
        return x + (drift(s, x) + sde_diff * u) * (t - s) + sde_diff * db

    return step


def exp_integrator_step_fn(apply_ctrl: Callable, alpha: float, sigma: float):
    """DDS exponential-integrator update as a kernel step_fn."""

    def step(params, s, t, x, noise):
        u = apply_ctrl(params, s, x)
        beta_k = jnp.clip(alpha * jnp.sqrt(t - s), 0.0, 1.0)
        alpha_k = jnp.sqrt(1.0 - beta_k**2)
        return x * alpha_k + (beta_k**2) * (sigma**2) * u + sigma * beta_k * noise

    return step
