"""Pallas TPU kernels for streamed log-domain Sinkhorn iterations.

This is the TPU-native replacement for the pykeops LazyTensor reductions the
reference uses (/root/reference/sde_sampler/eval/sinkhorn.py:112-178): the
N x M distance matrix is never materialized in HBM. Each kernel instance
holds a row block of x in VMEM, keeps the full y / dual vector resident in
VMEM, and accumulates an online logsumexp over column tiles; pairwise
distances come from an MXU dot (|x|^2 + |y|^2 - 2 x.y^T).

Used when y fits comfortably in VMEM (M*d*4 bytes <= ~8MB, i.e. all the
reference's 2-d/10-d Sinkhorn evaluations at n<=100k); the chunked-XLA path
in eval/sinkhorn.py covers the general case.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256
COL_CHUNK = 2048
VMEM_Y_LIMIT = 8 * 1024 * 1024  # bytes of VMEM budget for the resident y


def _pad_to(arr, multiple, axis=0, fill=0.0):
    pad = (-arr.shape[axis]) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)


def _softmin_kernel(x_ref, y_ref, v_ref, out_ref, *, eps, n_col_chunks):
    x = x_ref[:]  # (R, d)
    x_sq = (x * x).sum(axis=-1, keepdims=True)  # (R, 1)

    def body(c, state):
        m_run, s_run = state
        y_c = y_ref[pl.ds(c * COL_CHUNK, COL_CHUNK), :]  # (C, d)
        # dual laid out (n_chunks, C): dynamic slicing the sublane dim is
        # supported; lane-dim dynamic slices abort the Mosaic backend
        v_c = v_ref[pl.ds(c, 1), :]  # (1, C)
        y_sq = (y_c * y_c).sum(axis=-1)  # (C,)
        sq = (
            x_sq
            + y_sq[None, :]
            - 2.0 * jnp.dot(x, y_c.T, preferred_element_type=jnp.float32)
        )
        dist = jnp.sqrt(jnp.maximum(sq, 0.0))
        z = (v_c - dist) / eps  # (R, C)
        m_new = jnp.maximum(m_run, z.max(axis=1, keepdims=True))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.exp(z - m_new).sum(
            axis=1, keepdims=True
        )
        return m_new, s_run

    m0 = jnp.full((x.shape[0], 1), -jnp.inf, dtype=jnp.float32)
    s0 = jnp.zeros((x.shape[0], 1), dtype=jnp.float32)
    m_fin, s_fin = jax.lax.fori_loop(0, n_col_chunks, body, (m0, s0))
    out_ref[:] = m_fin + jnp.log(s_fin)


def _transport_kernel(x_ref, y_ref, u_ref, v_ref, out_ref, *, eps, n_col_chunks):
    x = x_ref[:]
    u = u_ref[:]  # (R, 1)
    x_sq = (x * x).sum(axis=-1, keepdims=True)

    def body(c, acc):
        y_c = y_ref[pl.ds(c * COL_CHUNK, COL_CHUNK), :]
        v_c = v_ref[pl.ds(c, 1), :]  # (1, C)
        y_sq = (y_c * y_c).sum(axis=-1)
        sq = (
            x_sq
            + y_sq[None, :]
            - 2.0 * jnp.dot(x, y_c.T, preferred_element_type=jnp.float32)
        )
        dist = jnp.sqrt(jnp.maximum(sq, 0.0))
        plan = jnp.exp((u + v_c - dist) / eps)
        return acc + (plan * dist).sum()

    out_ref[0, 0] = jax.lax.fori_loop(0, n_col_chunks, body, 0.0)


def pallas_applicable(n: int, m: int, d: int, p: int) -> bool:
    return p == 2 and m * d * 4 <= VMEM_Y_LIMIT


@partial(jax.jit, static_argnames=("eps",))
def softmin_pallas(x, y, dual, eps: float):
    """eps * logsumexp_j((-|x_i - y_j| + dual_j)/eps) for all rows i."""
    n, d = x.shape
    x_pad = _pad_to(x, ROW_BLOCK)
    y_pad = _pad_to(y, COL_CHUNK)
    dual_pad = _pad_to(dual, COL_CHUNK, fill=-jnp.inf)
    n_row_blocks = x_pad.shape[0] // ROW_BLOCK
    n_col_chunks = y_pad.shape[0] // COL_CHUNK
    dual_pad = dual_pad.reshape(n_col_chunks, COL_CHUNK)

    out = pl.pallas_call(
        partial(_softmin_kernel, eps=eps, n_col_chunks=n_col_chunks),
        grid=(n_row_blocks,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_col_chunks, COL_CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], 1), jnp.float32),
    )(x_pad, y_pad, dual_pad)
    return eps * out[:n, 0]


@partial(jax.jit, static_argnames=("eps",))
def transport_cost_pallas(x, y, u, v, eps: float):
    """sum_ij exp((-M_ij + u_i + v_j)/eps) * M_ij, streamed."""
    n, d = x.shape
    x_pad = _pad_to(x, ROW_BLOCK)
    u_pad = _pad_to(u.reshape(-1, 1), ROW_BLOCK, fill=-jnp.inf)
    y_pad = _pad_to(y, COL_CHUNK)
    v_pad = _pad_to(v, COL_CHUNK, fill=-jnp.inf)
    n_row_blocks = x_pad.shape[0] // ROW_BLOCK
    n_col_chunks = y_pad.shape[0] // COL_CHUNK
    v_pad = v_pad.reshape(n_col_chunks, COL_CHUNK)

    partials = pl.pallas_call(
        partial(_transport_kernel, eps=eps, n_col_chunks=n_col_chunks),
        grid=(n_row_blocks,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((y_pad.shape[0], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_col_chunks, COL_CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_row_blocks, 1), jnp.float32),
    )(x_pad, y_pad, u_pad, v_pad)
    return partials.sum()
