"""Fused gather + distance Pallas kernel.

The beam-search inner step ("fetch each popped node's neighbors, compute
query-candidate distances") is the framework's hottest memory pattern
(SURVEY §7 hard part 3).  The XLA lowering materializes the gathered
``(B, K, d)`` array in HBM — every candidate row moves HBM->HBM->VPU (3x
traffic).  This kernel streams each candidate row HBM->VMEM exactly once via
double-buffered row DMAs and reduces it to its distance contribution on the
VPU in the same pass (the TPU analog of the reference's prefetch-pipelined
scalar distance loop, greedy_search.h:124-203 + lib/prefetch.h).

Emitted quantity: ``out[b, k] = ||X[ids[b,k]]||^2 - 2 <q_b, X[ids[b,k]]>``
(the query-independent part of the squared-L2 norm algebra; callers add
``||q||^2`` and clamp, or negate-and-shift for MIP/cosine keys).  Emitting
the partial key keeps one kernel serving every metric.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(q_ref, rows_ref, dots_ref, x2_ref):
    """Single-pass scoring of pre-gathered rows.

    q_ref: (TB, d) VMEM; rows_ref: (TB, K, d) VMEM (pipelined per grid
    block); emits both reductions every metric needs: <q, x> and ||x||^2.
    """
    rows = rows_ref[:]                                  # (TB, K, d)
    q = q_ref[:]                                        # (TB, d)
    dots_ref[:] = jnp.sum(rows * q[:, None, :], axis=-1)
    x2_ref[:] = jnp.sum(rows * rows, axis=-1)


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def score_rows(rows: jax.Array, queries: jax.Array, *, tile_b: int = 8,
               interpret: bool = False):
    """(dots, x2) for pre-gathered candidate rows in one VMEM pass.

    ``rows`` (B, K, d) f32 (from an XLA gather), ``queries`` (B, d) f32 ->
    ((B, K) <q,x>, (B, K) ||x||^2).

    Rationale (PERF.md): XLA materializes (B, K, d) intermediates for the
    batched matvec + the norm reduction, tripling HBM traffic over the
    gathered bytes; this kernel streams each (TB, K, d) block through VMEM
    once (BlockSpec-pipelined DMA), measured ~1.5x the XLA lowering on the
    serving shapes and exact in f32.
    """
    b, k, d = rows.shape
    assert b % tile_b == 0, f"batch {b} not a multiple of tile_b {tile_b}"
    return pl.pallas_call(
        _score_kernel,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, k), jnp.float32)),
        interpret=interpret,
    )(queries, rows)


def score_rows_l2_partial(rows: jax.Array, queries: jax.Array, **kw):
    """Convenience: ``||x||^2 - 2 <q, x>`` via :func:`score_rows`."""
    dots, x2 = score_rows(rows, queries, **kw)
    return x2 - 2.0 * dots


def _kernel(ids_ref, q_ref, x_hbm, out_ref, rows, sems):
    """Grid program: one tile of TB queries; K candidate rows per query.

    ids_ref: (TB, K) int32 in SMEM
    q_ref:   (TB, d) f32 in VMEM
    x_hbm:   (N, d) f32 in HBM/ANY
    out_ref: (TB, K) f32 in VMEM
    rows:    (2, K, d) f32 VMEM scratch (double buffer)
    sems:    (2, K) DMA semaphores
    """
    tb = q_ref.shape[0]
    k = ids_ref.shape[1]

    def start_fetch(slot, t):
        def issue(j, _):
            idx = ids_ref[t, j]
            pltpu.make_async_copy(
                x_hbm.at[idx], rows.at[slot, j], sems.at[slot, j]).start()
            return 0
        jax.lax.fori_loop(0, k, issue, 0)

    def wait_fetch(slot, t):
        def wait(j, _):
            idx = ids_ref[t, j]
            pltpu.make_async_copy(
                x_hbm.at[idx], rows.at[slot, j], sems.at[slot, j]).wait()
            return 0
        jax.lax.fori_loop(0, k, wait, 0)

    start_fetch(0, 0)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < tb)
        def _():
            start_fetch(jax.lax.rem(t + 1, 2), t + 1)

        wait_fetch(slot, t)
        block = rows[slot]                                   # (K, d)
        q = q_ref[t, :]                                      # (d,)
        dots = jnp.sum(block * q[None, :], axis=-1)          # (K,)
        x2 = jnp.sum(block * block, axis=-1)
        out_ref[t, :] = x2 - 2.0 * dots
        return 0

    jax.lax.fori_loop(0, tb, body, 0)


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def gather_score_l2_partial(x: jax.Array, ids: jax.Array, queries: jax.Array,
                            *, tile_b: int = 8,
                            interpret: bool = False) -> jax.Array:
    """Fused gather+score: (N,d) f32, (B,K) int32, (B,d) f32 -> (B,K) f32
    partial L2 keys (``x2 - 2 q.x``).  Negative/out-of-range ids must be
    pre-clamped; callers mask their outputs.
    """
    b, k = ids.shape
    d = x.shape[1]
    assert b % tile_b == 0, f"batch {b} not a multiple of tile_b {tile_b}"
    grid = (b // tile_b,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, k, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, k)),
        ],
        interpret=interpret,
    )(ids, queries, x)
