"""Multi-chip sharded search and build steps.

TPU-native replacement for the reference's intra-node scaling machinery
(threadpools, NUMA partitioning — SURVEY §5): datasets and work batches are
laid out over a `jax.sharding.Mesh` and XLA inserts the ICI collectives.

Three production decompositions (BASELINE.json north star):

* **Query-parallel (dp)** — queries sharded, index replicated.  The direct
  analog of the reference's ``parallel_for`` over the query batch
  (index/vamana/index.h:563): zero cross-device traffic during search.
* **Data-sharded flat/IVF (shard)** — dataset rows sharded; each device scans
  its shard and produces a local top-k; one ``all_gather`` of (k per device)
  candidates + a final merge replaces the reference's NUMA-partitioned scans.
* **Data-parallel build (dp)** — each build round's node batch is sharded;
  graph/data are replicated and the round's row updates are exchanged by the
  compiler (the two-phase read-then-commit structure makes the round
  embarrassingly parallel, like the reference's thread-parallel
  generate_neighbors).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.data import VectorDataset
from ..core.graph import NeighborGraph
from ..lib import datatypes as dt
from ..ops import distance as dist_ops
from ..ops import topk as topk_ops
from ..index import flat as flat_mod
from ..index.vamana import search as search_mod


# ---------------------------------------------------------------------------
# Data-sharded flat search
# ---------------------------------------------------------------------------

def shard_dataset(data: VectorDataset, mesh: Mesh, axis: str = "shard"
                  ) -> VectorDataset:
    """Lay a dataset's rows out across a mesh axis (capacity is padded to a
    multiple of the axis size first)."""
    n_shards = mesh.shape[axis]
    tile = dt.pad_to(-(-data.capacity // n_shards), 8) * n_shards
    data = data.with_capacity(tile)
    sharding = NamedSharding(mesh, P(axis, None))
    vec = jax.device_put(data.vectors, sharding)
    norms = jax.device_put(data.norms_sq, NamedSharding(mesh, P(axis)))
    import dataclasses
    return dataclasses.replace(data, vectors=vec, norms_sq=norms)


def sharded_flat_search(mesh: Mesh, data: VectorDataset, queries: jax.Array,
                        k: int, distance, *, tile: int = 8192,
                        axis: str = "shard"
                        ) -> Tuple[jax.Array, jax.Array]:
    """Exhaustive top-k over a row-sharded dataset.

    ``data`` must be sharded with :func:`shard_dataset`.  Queries are
    replicated; each device runs the single-chip flat kernel over its shard
    and the per-shard top-k candidates are all-gathered and merged.

    Returns replicated (B, k) keys and global ids.
    """
    distance = dist_ops.as_distance(distance)
    n_shards = mesh.shape[axis]
    local_cap = data.capacity // n_shards
    eff_tile = min(dt.pad_to(tile, 128), local_cap)
    while local_cap % eff_tile != 0:
        eff_tile //= 2
    kk = min(k, local_cap)

    def local(vectors, norms, queries):
        import dataclasses
        idx = jax.lax.axis_index(axis)
        local_data = dataclasses.replace(
            data, vectors=vectors, norms_sq=norms, n=local_cap)
        # mask rows whose *global* id is past the live count (zero padding
        # would otherwise score 0 under MIP/cosine)
        row_mask = (jnp.arange(local_cap) + idx * local_cap) < data.n
        keys, ids = flat_mod.flat_search_kernel(
            local_data, queries, kk, eff_tile, distance, row_mask=row_mask)
        gids = jnp.where(ids >= 0, ids + idx * local_cap, -1)
        all_keys = jax.lax.all_gather(keys, axis, axis=1)   # (B, S, kk)
        all_ids = jax.lax.all_gather(gids, axis, axis=1)
        b = queries.shape[0]
        return topk_ops.smallest_k(
            all_keys.reshape(b, n_shards * kk),
            all_ids.reshape(b, n_shards * kk), k)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(fn)(data.vectors, data.norms_sq, queries)


# ---------------------------------------------------------------------------
# Cluster-sharded IVF search
# ---------------------------------------------------------------------------

def sharded_ivf_search(mesh: Mesh, index, queries: jax.Array, k: int, *,
                       n_probes: int, axis: str = "shard",
                       sub: int = 256):
    """IVF search with posting lists sharded across devices by cluster.

    Centroids are replicated (phase 1 = one replicated matmul); each device
    scans only the probed clusters it owns (the uniform padded layout makes
    cluster c's rows a contiguous local slice), and per-device top-k
    candidates are all-gathered and merged — the ICI analog of the
    reference's NUMA-partitioned posting scans (SURVEY §5).

    ``index``: a single-chip IVFIndex; its padded layout is resharded here.
    Returns replicated (B, k) keys and original ids.
    """
    import dataclasses
    from ..index.ivf.index import scan_padded_clusters

    distance = index.distance
    n_shards = mesh.shape[axis]
    kk = int(k)
    slot = index.slot
    eff_sub = min(sub, slot)
    while slot % eff_sub != 0:
        eff_sub //= 2
    n_clusters = index.num_centroids
    # pad cluster count to a multiple of the shard count
    k_pad = -(-n_clusters // n_shards) * n_shards
    grow_rows = (k_pad - n_clusters) * slot
    data = index.data
    ids_padded = index.ids_padded
    if grow_rows:
        data = data.with_capacity(data.capacity + grow_rows)
        ids_padded = jnp.pad(ids_padded, (0, grow_rows), constant_values=-1)
    local_k = k_pad // n_shards

    data_sh = dataclasses.replace(
        data,
        vectors=jax.device_put(data.vectors,
                               NamedSharding(mesh, P(axis, None))),
        norms_sq=jax.device_put(data.norms_sq, NamedSharding(mesh, P(axis))))
    ids_sh = jax.device_put(ids_padded, NamedSharding(mesh, P(axis)))

    centroids = index.centroids
    centroid_norms = index.centroid_norms
    n_probes = min(n_probes, n_clusters)

    def local(vectors, norms, idpad, q):
        me = jax.lax.axis_index(axis)
        local_data = dataclasses.replace(data, vectors=vectors,
                                         norms_sq=norms, n=vectors.shape[0])
        q_norms = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        ckeys = dist_ops.pairwise_keys(distance, q, centroids,
                                       vector_norms_sq=centroid_norms,
                                       query_norms_sq=q_norms)
        _, probes = topk_ops.smallest_k(ckeys, None, n_probes)
        # translate to local cluster ids; foreign probes masked out
        local_probe = probes - me * local_k
        mine = (local_probe >= 0) & (local_probe < local_k) & (probes >= 0)
        keys, ids = scan_padded_clusters(
            local_data, idpad, q, q_norms,
            jnp.where(mine, local_probe, 0), mine,
            keep=kk, slot=slot, sub=eff_sub, distance=distance)
        all_keys = jax.lax.all_gather(keys, axis, axis=1)     # (B, S, k)
        all_ids = jax.lax.all_gather(ids, axis, axis=1)
        b = q.shape[0]
        return topk_ops.smallest_k(all_keys.reshape(b, n_shards * kk),
                                   all_ids.reshape(b, n_shards * kk), kk)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis, None), P(axis), P(axis), P()),
                       out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)(data_sh.vectors, data_sh.norms_sq, ids_sh, queries)


# ---------------------------------------------------------------------------
# Query-parallel (dp) greedy search over a replicated index
# ---------------------------------------------------------------------------

def dp_greedy_search(mesh: Mesh, graph: NeighborGraph, data: VectorDataset,
                     queries: jax.Array, entry_ids: jax.Array, *,
                     window: int, capacity: int, max_iters: int,
                     distance, axis: str = "dp"):
    """Greedy search with the query batch sharded across ``axis`` and the
    index replicated — each device walks its own queries with no collective
    traffic (the scalable serving configuration)."""
    rep = NamedSharding(mesh, P())
    qsh = NamedSharding(mesh, P(axis, None))
    graph = jax.device_put(graph, rep)
    data = jax.device_put(data, rep)
    queries = jax.device_put(queries, qsh)
    entry_ids = jax.device_put(entry_ids, rep)
    out = search_mod.greedy_search(
        graph, data, queries, entry_ids, window=window, capacity=capacity,
        max_iters=max_iters, distance=dist_ops.as_distance(distance))
    return out


# ---------------------------------------------------------------------------
# Data-parallel build round
# ---------------------------------------------------------------------------

def dp_build_round(mesh: Mesh, graph: NeighborGraph, data: VectorDataset,
                   batch_ids: jax.Array, batch_valid: jax.Array,
                   entry_ids: jax.Array, *, axis: str = "dp", **round_kwargs):
    """One Vamana build round with the node batch sharded over ``axis``.

    Graph and dataset are replicated; the batched search + prune partitions
    along the batch dimension, and XLA exchanges the committed rows /
    reverse-edge traffic at the (cheap) commit points.  This is the
    multi-chip analog of the reference's thread-parallel generate_neighbors
    (vamana_build.h:327-478).
    """
    from ..index.vamana import build as build_mod
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    graph = jax.device_put(graph, rep)
    data = jax.device_put(data, rep)
    batch_ids = jax.device_put(batch_ids, bsh)
    batch_valid = jax.device_put(batch_valid, bsh)
    entry_ids = jax.device_put(entry_ids, rep)
    return build_mod.build_round(graph, data, batch_ids, batch_valid,
                                 entry_ids, **round_kwargs)
