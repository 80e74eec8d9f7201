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

import dataclasses
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


@partial(jax.tree_util.register_dataclass,
         data_fields=["codes", "scales", "biases", "mean"],
         meta_fields=["bits", "dim"])
@dataclasses.dataclass
class PackedLVQNeighborhoods:
    """Inline LVQ neighbor codes: the packed-neighborhood layout applied to
    quantized rows.

    The HBM gather is per-ROW limited (PERF.md), so LVQ's smaller rows buy
    nothing when gathered individually — but packed as (r x code-width)
    super-rows they keep the r-fold row-count reduction at 1/4 (LVQ8) to
    1/8 (LVQ4) of the bf16 packed footprint, which is what makes packed
    serving fit at 10M scale.  The decode (mean + bias + scale * code) is
    EXACT primary reconstruction in f32, so — unlike lossy bf16 packing —
    no final re-score pass is needed: results are bit-identical to the
    unpacked LVQ traversal.  This is the TPU analog of the reference's
    compressed functors running inside the hot loop
    (``include/svs/extensions/vamana/scalar.h:22-31``)."""

    codes: jax.Array    # (capacity, R, w1) int8; w1 = d_pad / (8 // bits)
    scales: jax.Array   # (capacity, R) f32 — per-NEIGHBOR level-1 scale
    biases: jax.Array   # (capacity, R) f32
    mean: jax.Array     # (d_pad,) f32 — dataset mean
    bits: int           # 4 or 8
    dim: int

    @property
    def dtype(self):
        return self.codes.dtype

    def decode(self, popped_flat: jax.Array, rows: int) -> jax.Array:
        """Gather + decode super-rows for ``popped_flat`` (rows * m,) node
        ids -> (rows, m * R, d_pad) f32 primary reconstructions — the
        shared exact decode (quantization.lvq.affine_decode), so results
        are bit-identical to the unpacked LVQ traversal by construction."""
        from ...quantization.lvq import affine_decode
        m_r = self.codes.shape[1]
        c = jnp.take(self.codes, popped_flat, axis=0, mode="clip")
        s = jnp.take(self.scales, popped_flat, axis=0, mode="clip")
        b = jnp.take(self.biases, popped_flat, axis=0, mode="clip")
        dec = affine_decode(c, s, b, self.mean[None, None, :],
                            bits=self.bits, dim=self.dim)
        return dec.reshape(rows, (popped_flat.shape[0] // rows) * m_r,
                           dec.shape[-1])


@partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("rows",))
def _pack_lvq_step(out_c, out_s, out_b, adjacency, codes, scales, biases,
                   start, *, rows: int):
    adj = jax.lax.dynamic_slice(adjacency, (start, 0),
                                (rows, adjacency.shape[1]))
    flat = jnp.maximum(adj, 0).reshape(-1)
    r = adj.shape[1]
    c = jnp.take(codes, flat, axis=0, mode="clip").reshape(rows, r, -1)
    s = jnp.take(scales, flat, mode="clip").reshape(rows, r)
    b = jnp.take(biases, flat, mode="clip").reshape(rows, r)
    return (jax.lax.dynamic_update_slice(out_c, c, (start, 0, 0)),
            jax.lax.dynamic_update_slice(out_s, s, (start, 0)),
            jax.lax.dynamic_update_slice(out_b, b, (start, 0)))


def pack_neighborhoods_lvq(graph, lvq, chunk: int = 65536
                           ) -> PackedLVQNeighborhoods:
    """Materialize inline neighbor LVQ codes + per-neighbor constants.

    Rows where ``adjacency[v, j] == -1`` hold row 0's codes; consumers mask
    by the adjacency ids.  Chunked with buffer donation like
    :func:`pack_neighborhoods`."""
    cap = graph.adjacency.shape[0]
    r = graph.adjacency.shape[1]
    w1 = lvq.codes.shape[1]
    chunk = min(chunk, cap)
    out_c = jnp.zeros((cap, r, w1), dtype=jnp.int8)
    out_s = jnp.zeros((cap, r), dtype=jnp.float32)
    out_b = jnp.zeros((cap, r), dtype=jnp.float32)
    start = 0
    while start < cap:
        rows = min(chunk, cap - start)
        out_c, out_s, out_b = _pack_lvq_step(
            out_c, out_s, out_b, graph.adjacency, lvq.codes, lvq.scales,
            lvq.biases, jnp.int32(start), rows=rows)
        start += rows
    return PackedLVQNeighborhoods(codes=out_c, scales=out_s, biases=out_b,
                                  mean=lvq.mean, bits=lvq.bits, dim=lvq.dim)
