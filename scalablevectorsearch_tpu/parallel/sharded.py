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

import dataclasses
import os
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


def shard_dataset_from_file(path: str, mesh: Mesh, axis: str = "shard",
                            *, dtype=None, block_rows: int = 1 << 18
                            ) -> VectorDataset:
    """Stream a ``*vecs`` file straight into the row-sharded device layout.

    Never materializes the whole array on the host (Deep-100M x 96 f32 is
    ~38 GB): rows are read in ``block_rows`` blocks into one per-shard
    staging buffer (peak host memory = dataset_size / n_shards) that is
    ``device_put`` to its device and freed before the next shard streams.
    Produces a dataset bit-identical to
    ``shard_dataset(VectorDataset.from_array(read_vecs(path)), ...)``
    (same capacity tiling, same on-device norm computation) — tested in
    test_parallel.py.  SURVEY §7 step 8 / BASELINE configs[4].
    """
    import numpy as np

    from ..core import io as core_io
    n, dim = core_io.probe_vecs_shape(path, dtype)
    if n == 0:
        raise ValueError(f"{path} is empty")
    d_pad = dt.padded_dim(dim)
    n_shards = mesh.shape[axis]
    if len(mesh.shape) != 1:
        raise ValueError("shard_dataset_from_file expects a 1-d mesh")
    cap0 = dt.padded_count(n, jnp.float32)
    per = dt.pad_to(-(-cap0 // n_shards), 8)
    tile = per * n_shards
    devices = mesh.devices.ravel()

    pieces = []
    for s, dev in enumerate(devices):
        buf = np.zeros((per, d_pad), dtype=np.float32)
        lo, hi = min(s * per, n), min((s + 1) * per, n)
        for bstart in range(lo, hi, block_rows):
            blk = core_io.read_vecs_rows(
                path, bstart, min(block_rows, hi - bstart), dtype)
            buf[bstart - s * per: bstart - s * per + blk.shape[0],
                :dim] = blk
        pieces.append(jax.device_put(buf, dev))
        del buf
    sharding = NamedSharding(mesh, P(axis, None))
    vectors = jax.make_array_from_single_device_arrays(
        (tile, d_pad), sharding, pieces)

    # norms on device, matching VectorDataset.from_array's jnp computation
    @partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def _norms(v):
        norms = jnp.sum(v.astype(jnp.float32) ** 2, axis=-1)
        return jnp.where(jnp.arange(v.shape[0]) < n, norms, jnp.inf)

    norms = _norms(vectors)
    return VectorDataset(vectors=vectors, norms_sq=norms, n=n, dim=dim)


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
    from ..index.ivf.index import (_pick_subtile, _resolve_tiles_per_step,
                                   scan_padded_clusters)

    distance = index.distance
    n_shards = mesh.shape[axis]
    kk = int(k)
    slot = index.slot
    eff_sub = _pick_subtile(slot, sub)
    eff_tiles = _resolve_tiles_per_step(0, slot // eff_sub)
    # shard by PROBE UNIT (= centroid row): chunked layouts have more
    # units than logical clusters (oversized clusters split into units
    # that replicate their centroid — index.py assemble_from_clustering)
    n_clusters = getattr(index, "num_probe_units", index.num_centroids)
    # pad unit count to a multiple of the shard count
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
            keep=kk, slot=slot, sub=eff_sub, distance=distance,
            tiles_per_step=eff_tiles)
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
                     distance, axis: str = "dp", sampler=None,
                     n_entries: int = 1):
    """Greedy search with the query batch sharded across ``axis`` and the
    index replicated — each device walks its own queries with no collective
    traffic (the scalable serving configuration).

    ``sampler``: optional :class:`~..index.vamana.entry.EntrySampler`
    (replicated; tiny).  Per-query entry selection shards along the query
    axis with everything else — no extra collectives."""
    distance = dist_ops.as_distance(distance)
    rep = NamedSharding(mesh, P())
    qsh = NamedSharding(mesh, P(axis, None))
    graph = jax.device_put(graph, rep)
    data = jax.device_put(data, rep)
    queries = jax.device_put(queries, qsh)
    if sampler is not None:
        sampler = jax.device_put(sampler, rep)
        entry_ids = sampler.select(distance, queries, n_entries=n_entries)
    else:
        entry_ids = jax.device_put(entry_ids, rep)
    out = search_mod.greedy_search(
        graph, data, queries, entry_ids, window=window, capacity=capacity,
        max_iters=max_iters, distance=distance)
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


# ---------------------------------------------------------------------------
# Sharded-graph Vamana: graph rows + vectors sharded across the mesh
# ---------------------------------------------------------------------------
#
# The memory-scaling configuration (the reference's NUMA partitioning of the
# data structures themselves, include/svs/lib/numa.h:230): each device owns a
# contiguous block of graph rows and dataset rows.  Search/build run the
# UNCHANGED single-chip algorithms over "shard view" pytrees that implement
# the graph/dataset protocol with collectives:
#
# * adjacency rows:  local gather, non-owners contribute -1, pmax merge
# * score keys:      local gather+score, non-owners contribute +inf, pmin
# * vector rows:     local gather, non-owners contribute 0, psum
# * row commits:     each device applies only the updates it owns
#
# Because every device sees identical reduced values, the lockstep beam state
# stays replicated and `while_loop` conditions are uniform across the mesh —
# no divergence, and results are bit-identical to the single-chip path.

@partial(jax.tree_util.register_dataclass,
         data_fields=["adjacency", "degrees"],
         meta_fields=["axis", "n", "max_degree", "global_capacity"])
@dataclasses.dataclass
class ShardedGraphShard:
    """Per-device block of graph rows; methods are valid inside shard_map."""

    adjacency: jax.Array    # (rows_per_shard, R) int32
    degrees: jax.Array      # (rows_per_shard,) int32
    axis: str
    n: int                  # global live node count
    max_degree: int
    global_capacity: int

    @property
    def capacity(self) -> int:
        return self.global_capacity

    @property
    def rows_per_shard(self) -> int:
        return self.adjacency.shape[0]

    def _local(self, ids: jax.Array):
        offset = jax.lax.axis_index(self.axis) * self.rows_per_shard
        lid = ids - offset
        mine = (ids >= 0) & (lid >= 0) & (lid < self.rows_per_shard)
        return jnp.clip(lid, 0, self.rows_per_shard - 1), mine

    def neighbors(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        rows = jnp.take(self.adjacency, lid, axis=0)
        rows = jnp.where(mine[:, None], rows, -1)
        return jax.lax.pmax(rows, self.axis)

    def degrees_of(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        deg = jnp.where(mine, jnp.take(self.degrees, lid), 0)
        return jax.lax.psum(deg, self.axis)

    def replace_rows(self, ids, rows, new_degrees) -> "ShardedGraphShard":
        lid, mine = self._local(ids)
        idx = jnp.where(mine, lid, self.rows_per_shard)   # OOB -> dropped
        adjacency = self.adjacency.at[idx].set(rows, mode="drop")
        degrees = self.degrees.at[idx].set(new_degrees, mode="drop")
        return dataclasses.replace(self, adjacency=adjacency,
                                   degrees=degrees)

    def scatter_edges(self, dst, slot, src, valid) -> "ShardedGraphShard":
        lid, mine = self._local(dst)
        ok = valid & mine
        r = self.max_degree
        oob = self.rows_per_shard * r
        flat_idx = jnp.where(ok, lid * r + slot, oob)
        flat = self.adjacency.reshape(-1)
        flat = flat.at[flat_idx].set(src.astype(jnp.int32), mode="drop")
        counts = jax.ops.segment_sum(
            ok.astype(jnp.int32), jnp.where(ok, lid, self.rows_per_shard),
            num_segments=self.rows_per_shard + 1)[: self.rows_per_shard]
        return dataclasses.replace(
            self, adjacency=flat.reshape(self.adjacency.shape),
            degrees=self.degrees + counts)

    def clear_rows(self, ids: jax.Array) -> "ShardedGraphShard":
        lid, mine = self._local(ids)
        idx = jnp.where(mine, lid, self.rows_per_shard)
        rows = jnp.full((ids.shape[0], self.max_degree), -1, jnp.int32)
        adjacency = self.adjacency.at[idx].set(rows, mode="drop")
        degrees = self.degrees.at[idx].set(0, mode="drop")
        return dataclasses.replace(self, adjacency=adjacency,
                                   degrees=degrees)


@partial(jax.tree_util.register_dataclass,
         data_fields=["vectors", "norms_sq"],
         meta_fields=["axis", "n", "dim"])
@dataclasses.dataclass
class ShardedDataShard:
    """Per-device block of dataset rows; methods are valid inside shard_map.

    ``score_keys`` is the protocol hook greedy_search / build use instead of
    gather-then-score, so vector rows never cross the interconnect during
    traversal — only (B, K) key panels do (pmin).
    """

    vectors: jax.Array      # (rows_per_shard, d_pad)
    norms_sq: jax.Array     # (rows_per_shard,)
    axis: str
    n: int                  # global live row count
    dim: int

    @property
    def rows_per_shard(self) -> int:
        return self.vectors.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.vectors.shape[1]

    def _local(self, ids: jax.Array):
        offset = jax.lax.axis_index(self.axis) * self.rows_per_shard
        lid = ids - offset
        mine = (ids >= 0) & (lid >= 0) & (lid < self.rows_per_shard)
        return jnp.clip(lid, 0, self.rows_per_shard - 1), mine

    def get(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        rows = jnp.take(self.vectors, lid, axis=0).astype(jnp.float32)
        rows = jnp.where(mine[..., None], rows, 0.0)
        return jax.lax.psum(rows, self.axis)

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        norms = jnp.where(mine, jnp.take(self.norms_sq, lid), 0.0)
        return jax.lax.psum(norms, self.axis)

    def score_keys(self, distance, queries, q_norms, ids) -> jax.Array:
        """(B, K) ids -> (B, K) keys; local score + pmin over the shard
        axis (the collective replacement for gather-then-score)."""
        lid, mine = self._local(ids)
        vecs = jnp.take(self.vectors, lid, axis=0)
        keys = dist_ops.gathered_keys(distance, queries, vecs,
                                      query_norms_sq=q_norms)
        in_range = mine & (ids < self.n)
        keys = jnp.where(in_range, keys, jnp.inf)
        return jax.lax.pmin(keys, self.axis)


@partial(jax.tree_util.register_dataclass,
         data_fields=["codes", "scales", "biases", "mean", "norms_sq",
                      "res_codes", "res_scales", "full_norms_sq"],
         meta_fields=["axis", "n", "dim", "bits", "residual_bits"])
@dataclasses.dataclass
class ShardedLVQShard:
    """Per-device block of LVQ rows (codes + per-row constants sharded, mean
    replicated); methods are valid inside shard_map.

    The compressed counterpart of :class:`ShardedDataShard` (VERDICT r2 ask
    4): decode is LOCAL — only (B, K) key panels (pmin) or decoded row
    blocks the caller explicitly asked for (psum) cross the interconnect,
    never the code arrays.  Mirrors ``LVQDataset.get`` (quantization/lvq.py)
    bit-for-bit so sharded traversal is bit-identical to single-chip LVQ
    traversal; the multi-chip analog of the reference's compressed functors
    under NUMA partitioning (include/svs/lib/numa.h:230,
    extensions/vamana/scalar.h:22-31)."""

    codes: jax.Array        # (rows_per_shard, w1) int8
    scales: jax.Array       # (rows_per_shard,) f32
    biases: jax.Array       # (rows_per_shard,) f32
    mean: jax.Array         # (d_pad,) f32 — replicated
    norms_sq: jax.Array     # (rows_per_shard,) f32 — primary recon norms
    res_codes: jax.Array    # (rows_per_shard, w2) int8; (rps, 0) if absent
    res_scales: jax.Array   # (rows_per_shard,) f32
    full_norms_sq: jax.Array  # (rows_per_shard,) f32
    axis: str
    n: int                  # global live row count
    dim: int
    bits: int
    residual_bits: int

    @property
    def rows_per_shard(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.codes.shape[1] * (8 // self.bits)

    def _local(self, ids: jax.Array):
        offset = jax.lax.axis_index(self.axis) * self.rows_per_shard
        lid = ids - offset
        mine = (ids >= 0) & (lid >= 0) & (lid < self.rows_per_shard)
        return jnp.clip(lid, 0, self.rows_per_shard - 1), mine

    def _decode_local(self, lid: jax.Array) -> jax.Array:
        """Primary-level decode of local rows — the shared exact decode
        (quantization.lvq.affine_decode), bit-identical to
        LVQDataset.get by construction."""
        from ..quantization.lvq import affine_decode
        rows = jnp.take(self.codes, lid, axis=0)
        s = jnp.take(self.scales, lid, axis=0)
        b = jnp.take(self.biases, lid, axis=0)
        return affine_decode(rows, s, b, self.mean,
                             bits=self.bits, dim=self.dim)

    def get(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        rows = jnp.where(mine[..., None], self._decode_local(lid), 0.0)
        return jax.lax.psum(rows, self.axis)

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def get_full(self, ids: jax.Array) -> jax.Array:
        """Two-level reconstruction (psum) — mirrors LVQDataset.get_full."""
        from ..quantization.lvq import _unpack4
        lid, mine = self._local(ids)
        dec = self._decode_local(lid)
        if self.residual_bits:
            rows = jnp.take(self.res_codes, lid, axis=0)
            if self.residual_bits == 4:
                rows = _unpack4(rows)
            rs = jnp.take(self.res_scales, lid, axis=0)
            live = (jnp.arange(self.padded_dim)
                    < self.dim).astype(jnp.float32)
            dec = dec + rs[..., None] * rows.astype(jnp.float32) * live
        rows = jnp.where(mine[..., None], dec, 0.0)
        return jax.lax.psum(rows, self.axis)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        norms = jnp.where(mine, jnp.take(self.norms_sq, lid), 0.0)
        return jax.lax.psum(norms, self.axis)

    def score_keys(self, distance, queries, q_norms, ids) -> jax.Array:
        """(B, K) ids -> (B, K) keys; local decode + score, pmin merge.

        Norms are recomputed from the decoded rows (NOT the stored norm
        cache) to match the single-chip greedy scoring path bit-for-bit
        (index/vamana/search.py `score`)."""
        lid, mine = self._local(ids)
        vecs = self._decode_local(lid)
        keys = dist_ops.gathered_keys(distance, queries, vecs,
                                      query_norms_sq=q_norms)
        in_range = mine & (ids < self.n)
        keys = jnp.where(in_range, keys, jnp.inf)
        return jax.lax.pmin(keys, self.axis)


@partial(jax.tree_util.register_dataclass,
         data_fields=["codes", "norms_sq", "code_sums", "scale", "bias"],
         meta_fields=["axis", "n", "dim"])
@dataclasses.dataclass
class ShardedSQShard:
    """Per-device block of SQ rows (codes sharded, global scale/bias
    replicated); the scalar-quantization counterpart of
    :class:`ShardedLVQShard` (reference scalar.h:364 under NUMA
    partitioning)."""

    codes: jax.Array        # (rows_per_shard, d_pad) int8/uint8/int16
    norms_sq: jax.Array     # (rows_per_shard,) f32
    code_sums: jax.Array    # (rows_per_shard,) f32
    scale: jax.Array        # () f32 — replicated
    bias: jax.Array         # () f32 — replicated
    axis: str
    n: int
    dim: int

    @property
    def rows_per_shard(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.codes.shape[1]

    def _local(self, ids: jax.Array):
        offset = jax.lax.axis_index(self.axis) * self.rows_per_shard
        lid = ids - offset
        mine = (ids >= 0) & (lid >= 0) & (lid < self.rows_per_shard)
        return jnp.clip(lid, 0, self.rows_per_shard - 1), mine

    def _decode_local(self, lid: jax.Array) -> jax.Array:
        rows = jnp.take(self.codes, lid, axis=0).astype(jnp.float32)
        live = (jnp.arange(self.padded_dim) < self.dim).astype(jnp.float32)
        return (rows * self.scale + self.bias) * live

    def get(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        rows = jnp.where(mine[..., None], self._decode_local(lid), 0.0)
        return jax.lax.psum(rows, self.axis)

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        lid, mine = self._local(ids)
        norms = jnp.where(mine, jnp.take(self.norms_sq, lid), 0.0)
        return jax.lax.psum(norms, self.axis)

    def score_keys(self, distance, queries, q_norms, ids) -> jax.Array:
        lid, mine = self._local(ids)
        vecs = self._decode_local(lid)
        keys = dist_ops.gathered_keys(distance, queries, vecs,
                                      query_norms_sq=q_norms)
        in_range = mine & (ids < self.n)
        keys = jnp.where(in_range, keys, jnp.inf)
        return jax.lax.pmin(keys, self.axis)


def shard_lvq(lvq, mesh: Mesh, axis: str = "shard"):
    """Lay an ``LVQDataset``'s rows across a mesh axis.  Returns (arrays
    tuple, meta dict) for :class:`ShardedLVQShard`: codes/constants sharded
    by row block, mean replicated."""
    n_shards = mesh.shape[axis]
    cap = dt.pad_to(-(-lvq.capacity // n_shards), 8) * n_shards
    lvq = lvq.with_capacity(cap)
    if lvq.capacity != cap:           # with_capacity pads to 32 internally
        cap = lvq.capacity
        if cap % n_shards:
            raise ValueError(f"capacity {cap} not divisible by {n_shards}")
    row = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    arrays = (jax.device_put(lvq.codes, row),
              jax.device_put(lvq.scales, vec),
              jax.device_put(lvq.biases, vec),
              jax.device_put(lvq.mean, rep),
              jax.device_put(lvq.norms_sq, vec),
              jax.device_put(lvq.res_codes, row),
              jax.device_put(lvq.res_scales, vec),
              jax.device_put(lvq.full_norms_sq, vec))
    meta = dict(axis=axis, n=lvq.n, dim=lvq.dim, bits=lvq.bits,
                residual_bits=lvq.residual_bits)
    specs = (P(axis, None), P(axis), P(axis), P(), P(axis), P(axis, None),
             P(axis), P(axis))
    return arrays, specs, meta


def shard_sq(sq, mesh: Mesh, axis: str = "shard"):
    """Lay an ``SQDataset``'s rows across a mesh axis (codes sharded,
    global scale/bias replicated)."""
    import numpy as np
    n_shards = mesh.shape[axis]
    cap = dt.pad_to(-(-sq.capacity // n_shards), 8) * n_shards
    if cap > sq.capacity:
        g = cap - sq.capacity
        sq = dataclasses.replace(
            sq,
            codes=jnp.pad(sq.codes, ((0, g), (0, 0))),
            norms_sq=jnp.pad(sq.norms_sq, (0, g),
                             constant_values=np.inf),
            code_sums=jnp.pad(sq.code_sums, (0, g)))
    row = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    arrays = (jax.device_put(sq.codes, row),
              jax.device_put(sq.norms_sq, vec),
              jax.device_put(sq.code_sums, vec),
              jax.device_put(sq.scale, rep),
              jax.device_put(sq.bias, rep))
    meta = dict(axis=axis, n=sq.n, dim=sq.dim)
    specs = (P(axis, None), P(axis), P(axis), P(), P())
    return arrays, specs, meta


def _graph_shard_meta(graph: NeighborGraph, n_shards: int):
    rps = dt.pad_to(-(-graph.capacity // n_shards), 8)
    return rps, rps * n_shards


def shard_graph(graph: NeighborGraph, mesh: Mesh, axis: str = "shard"):
    """Lay a graph's rows out across a mesh axis; returns (adjacency,
    degrees) device arrays sharded along the axis plus the view metadata."""
    rps, cap = _graph_shard_meta(graph, mesh.shape[axis])
    graph = graph.with_capacity(cap)
    sh = NamedSharding(mesh, P(axis, None))
    adjacency = jax.device_put(graph.adjacency, sh)
    degrees = jax.device_put(graph.degrees, NamedSharding(mesh, P(axis)))
    meta = dict(axis=axis, n=graph.n, max_degree=graph.max_degree,
                global_capacity=cap)
    return adjacency, degrees, meta


def shard_any_dataset(data, mesh: Mesh, axis: str = "shard"):
    """Shard any protocol dataset's rows across a mesh axis.

    Returns ``(arrays, specs, make_view)`` where ``make_view(*local_blocks)``
    builds the matching shard view inside a shard_map body.  Dispatches on
    dataset kind: f32/bf16 -> :class:`ShardedDataShard`, LVQ ->
    :class:`ShardedLVQShard`, SQ -> :class:`ShardedSQShard` (VERDICT r2 ask
    4: compressed datasets get collective shard views too)."""
    from ..quantization.lvq import LVQDataset
    from ..quantization.scalar import SQDataset
    if isinstance(data, LVQDataset):
        arrays, specs, meta = shard_lvq(data, mesh, axis)
        return arrays, specs, lambda *b: ShardedLVQShard(*b, **meta)
    if isinstance(data, SQDataset):
        arrays, specs, meta = shard_sq(data, mesh, axis)
        return arrays, specs, lambda *b: ShardedSQShard(*b, **meta)
    data_sh = shard_dataset(data, mesh, axis)
    meta = dict(axis=axis, n=data.n, dim=data.dim)
    return ((data_sh.vectors, data_sh.norms_sq), (P(axis, None), P(axis)),
            lambda *b: ShardedDataShard(*b, **meta))


def sharded_greedy_search(mesh: Mesh, graph: NeighborGraph,
                          data, queries, entry_ids, *,
                          window: int, capacity: int, max_iters: int,
                          distance, pool_size: int = 0, pop_width: int = 4,
                          axis: str = "shard", sampler=None,
                          n_entries: int = 1):
    """Greedy search over a row-sharded graph + dataset (replicated queries).

    Bit-identical to the single-chip search: the per-iteration gathers
    become (local gather, pmax/pmin merge) pairs, the beam state stays
    replicated.  Memory per device is O(n / n_shards).  ``data`` may be a
    plain ``VectorDataset`` or a compressed ``LVQDataset`` / ``SQDataset``
    (codes sharded, decode local — see :func:`shard_any_dataset`).

    ``sampler``: optional :class:`~..index.vamana.entry.EntrySampler` for
    per-query entries.  The sample is tiny (S rows), so it stays replicated
    and each device selects redundantly — no collective traffic added."""
    distance = dist_ops.as_distance(distance)
    adjacency, degrees, g_meta = shard_graph(graph, mesh, axis)
    d_arrays, d_specs, make_view = shard_any_dataset(data, mesh, axis)
    nd = len(d_arrays)
    s_arrays = () if sampler is None else (
        sampler.vectors, sampler.norms_sq, sampler.ids)
    s_specs = () if sampler is None else (P(), P(), P())

    def local(adj, deg, q, eids, *rest):
        gview = ShardedGraphShard(adj, deg, **g_meta)
        dview = make_view(*rest[:nd])
        if sampler is not None:
            from ..index.vamana.entry import EntrySampler
            s = EntrySampler(*rest[nd:])
            eids = s.select(distance, q, n_entries=n_entries)
        return search_mod.greedy_search(
            gview, dview, q, eids, window=window, capacity=capacity,
            max_iters=max_iters, distance=distance, pool_size=pool_size,
            pop_width=pop_width)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), *d_specs, *s_specs),
        out_specs=P(), check_vma=False)
    return jax.jit(fn)(adjacency, degrees, queries, entry_ids,
                       *d_arrays, *s_arrays)


def sharded_build_graph(mesh: Mesh, data, params, distance, *,
                        axis: str = "shard", batch_size=None,
                        prune_chunk: int = 128, pop_width: int = 4,
                        prune_pool: int = 0, tail_frac: int = 1,
                        first_pass_window=None,
                        entry_point=None, sampled_entries: bool = False,
                        entry_sample_size=None):
    """Full Vamana build with graph rows + vectors sharded across the mesh.

    Runs the unchanged fused build round (index/vamana/build.py) over shard
    views: search/scoring traffic is (B, K) key panels (pmin), prune-pool
    vector gathers are psum'd blocks, and each device commits only the
    adjacency rows it owns.  Returns (NeighborGraph on host, entry_point).

    ``prune_pool`` / ``tail_frac`` / ``first_pass_window`` are the
    single-chip builder's levers (build.py build_graph) plumbed through
    unchanged — at Deep-100M scale (BASELINE configs[4]) their savings
    multiply by the device count.  The sharded rounds produce the SAME
    graph as the single-chip builder for any knob setting (the build round
    is the same executable over shard views; tested in test_parallel.py).

    This is the configuration for datasets that cannot replicate per device
    (SURVEY §7 step 8; BASELINE Deep-100M).
    """
    import numpy as np
    from ..core.medioid import compute_medioid
    from ..index.vamana import build as build_mod

    distance = dist_ops.as_distance(distance)
    if isinstance(data, (str, os.PathLike)):
        # streamed shard-at-load: never materialize the full array on the
        # host (Deep-100M feasibility — the medioid/sampler below run over
        # the already-sharded device arrays)
        data = shard_dataset_from_file(os.fspath(data), mesh, axis)
        data_presharded = True
    else:
        if not isinstance(data, VectorDataset):
            data = VectorDataset.from_array(data)
        data_presharded = False
    params = params.resolved(distance)
    n = data.n
    r = params.graph_max_degree

    entry = entry_point if entry_point is not None else compute_medioid(data)
    entry_ids = jnp.asarray([int(entry)], dtype=jnp.int32)

    sampler = None
    sample_ids_host = None
    if sampled_entries:
        # same lever as the single-device builder (build.py): per-node
        # entries from a replicated sample; pass 1 masks not-yet-inserted
        # sample rows so searches never enter edge-less nodes
        from ..index.vamana.entry import build_sampler
        sampler = build_sampler(data, entry_sample_size)
        sample_ids_host = np.asarray(sampler.ids)

    graph0 = NeighborGraph.empty(n, r)
    adjacency, degrees, g_meta = shard_graph(graph0, mesh, axis)
    data_sh = data if data_presharded else shard_dataset(data, mesh, axis)

    b = batch_size if batch_size is not None else \
        build_mod.default_batch_size(n)
    pool_size = params.max_candidate_pool_size
    num_batches = -(-n // b)

    def round_local(adj, deg, vec, nrm, batch_ids, batch_valid, eids,
                    *s_ops, window, max_iters, rev_alpha):
        gview = ShardedGraphShard(adj, deg, **g_meta)
        dview = ShardedDataShard(vec, nrm, axis=axis, n=n, dim=data.dim)
        smp = sinv = None
        if s_ops:
            from ..index.vamana.entry import EntrySampler
            smp, sinv = EntrySampler(*s_ops[:3]), s_ops[3]
        g2, dropped = build_mod.build_round(
            gview, dview, batch_ids, batch_valid, eids, smp, sinv,
            window=window, capacity=window, max_iters=max_iters,
            distance=distance, pool_size=pool_size,
            gen_alpha=float(params.alpha), rev_alpha=float(rev_alpha),
            prune_to=params.prune_to, max_degree=r,
            prune_chunk=prune_chunk, pop_width=pop_width,
            prune_pool=prune_pool, tail_frac=tail_frac)
        return g2.adjacency, g2.degrees, dropped

    s_specs = () if sampler is None else (P(), P(), P(), P())
    s_base = () if sampler is None else (sampler.vectors, sampler.norms_sq,
                                         sampler.ids)
    pass_windows = (first_pass_window or params.window_size,
                    params.window_size)
    compiled = {}
    for pass_idx, rev_alpha in enumerate((1.0, float(params.alpha))):
        window = pass_windows[pass_idx]
        max_iters = search_mod.default_max_iters(window)
        key = (rev_alpha, window)
        if key not in compiled:
            fn = jax.shard_map(
                partial(round_local, window=window, max_iters=max_iters,
                        rev_alpha=rev_alpha),
                mesh=mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P(), P(), *s_specs),
                out_specs=(P(axis, None), P(axis), P()),
                check_vma=False)
            compiled[key] = jax.jit(fn)
        for batch_idx in range(num_batches):
            start = batch_idx * b
            ids = np.arange(start, start + b, dtype=np.int32)
            valid = ids < n
            ids = np.minimum(ids, n - 1)
            s_ops = () if sampler is None else (*s_base, jnp.asarray(
                sample_ids_host >= (n if pass_idx else start)))
            adjacency, degrees, _ = compiled[key](
                adjacency, degrees, data_sh.vectors, data_sh.norms_sq,
                jnp.asarray(ids), jnp.asarray(valid), entry_ids, *s_ops)
        jax.block_until_ready(adjacency)

    graph = NeighborGraph(adjacency=jnp.asarray(np.asarray(adjacency))[:n],
                          degrees=jnp.asarray(np.asarray(degrees))[:n],
                          n=n, max_degree=r)
    return graph, int(entry)
