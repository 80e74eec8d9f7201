"""Packed neighborhoods: inline neighbor vectors for gather-bound serving.

TPU HBM row-gathers are per-ROW limited, not per-byte (PERF.md round-2
findings: ~9 ns/row whether the row is 32 B or 512 B).  The greedy-search
iteration gathers ``B * m * r`` scattered vector rows; packing each node's
neighbor *vectors* inline as one contiguous ``(r, d)`` super-row turns that
into ``B * m`` gathers of 8-16 KB rows — r-fold fewer rows at the per-row
price point where bytes start to matter instead.

This is the TPU analog of the reference/DiskANN block layout that stores a
node's neighborhood adjacent to the node for locality
(``include/svs/index/vamana/greedy_search.h`` prefetch pipeline +
``lib/prefetch.h:172``): the CPU version hides row latency with prefetch;
the TPU version removes the per-row DMA count outright.

Cost: ``capacity * r * d * itemsize`` HBM (bf16 default: 2 bytes/dim —
0.8 GB at 100k x 32 x 128, 8 GB at 1M).  A capacity-for-latency trade for
*serving*; the index data itself stays exact, and the final beam is
re-scored against the exact rows (one C-row gather per query) so returned
distances are full precision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, donate_argnums=(0,), static_argnames=("rows", "dtype"))
def _pack_step(out, adjacency, vectors, start, *, rows: int, dtype):
    """Fill ``out[start:start+rows]`` in place (donated buffer)."""
    adj = jax.lax.dynamic_slice(adjacency, (start, 0),
                                (rows, adjacency.shape[1]))
    rows_v = jnp.take(vectors, jnp.maximum(adj, 0).reshape(-1), axis=0,
                      mode="clip")
    piece = rows_v.astype(dtype).reshape(rows, adj.shape[1], -1)
    return jax.lax.dynamic_update_slice(out, piece, (start, 0, 0))


def pack_neighborhoods(graph, data, dtype=jnp.bfloat16,
                       chunk: int = 65536) -> jax.Array:
    """Materialize ``packed[v, j, :] = vectors[adjacency[v, j]]``.

    Rows where ``adjacency[v, j] == -1`` hold row 0's vector; consumers mask
    by the adjacency ids, never by the packed contents.  Chunked (with
    buffer donation) to bound the transient gather output: peak extra HBM is
    one ``(chunk, r, d)`` piece beyond the packed array itself.
    """
    cap = graph.adjacency.shape[0]
    r = graph.adjacency.shape[1]
    d = data.vectors.shape[1]
    chunk = min(chunk, cap)
    out = jnp.zeros((cap, r, d), dtype=dtype)
    start = 0
    while start < cap:
        rows = min(chunk, cap - start)
        out = _pack_step(out, graph.adjacency, data.vectors,
                         jnp.int32(start), rows=rows, dtype=dtype)
        start += rows
    return out
