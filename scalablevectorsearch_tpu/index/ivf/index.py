"""Static IVF index.

TPU-native analog of the reference's ``IVFIndex``
(``include/svs/index/ivf/index.h:111``).  The reference's two-phase search —
GEMM to all centroids, then threadpool scans over contiguous posting lists
(``index.h:410-458``, two-level threading ``index.h:117-158``) — maps to:

  phase 1: one (B, K) MXU distance matmul + top-n_probes
           (the reference's ``search_centroids``, common.h:854-890);
  phase 2: a ``fori_loop`` over probe slots where each step row-gathers one
           posting-list tile for the whole query batch and folds it into a
           running top-(k_reorder * k) state (the reference's
           ``search_leaves``, common.h:897-925, with the intra-query
           threadpool replaced by batch parallelism);
  phase 3: optional full-precision re-scoring of the k_reorder * k survivors
           (the k_reorder reranking knob) and final top-k.

Posting lists are stored as **uniform padded clusters** inside one reordered
dataset (cluster c owns rows [c*slot, (c+1)*slot)), the dense-regular analog
of the reference's ``DenseClusteredDataset`` (ivf/clustering.h:314): slices
replace pointer-chased list offsets, at the cost of padding — acceptable on
TPU where regular layout buys back far more than the padding wastes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.data import VectorDataset
from ...core.query_result import QueryResult
from ...lib import datatypes as dt
from ...lib import saveload
from ...ops import distance as dist_ops
from ...ops import topk as topk_ops
from .clustering import Clustering
from .params import IVFBuildParameters, IVFSearchParameters

CONFIG_FILENAME = "ivf_config.json"


def _pick_subtile(slot: int, scan_subtile: int) -> int:
    """Largest divisor of ``slot`` <= ``scan_subtile``.

    ``sub`` must divide ``slot`` (the fori scan covers slot/sub tiles per
    probe); the old power-of-two fallback collapsed hard on awkward slots
    (slot=2112 with subtile 256 halved to 64 -> 33 merge steps per probe
    where the 192-divisor needs 11)."""
    sub = min(scan_subtile, slot)
    while slot % sub != 0:
        sub -= 1
    return sub


def _resolve_tiles_per_step(requested: int, n_sub: int,
                            use_scan: bool = False) -> int:
    """Resolve the per-step chunk size (0 = auto).

    Auto folds the WHOLE probed cluster per step (g = n_sub) only on the
    super-row scan layout, where it was measured (10M, K=9486, slot=2112,
    sub=192, bf16 super-rows): per-probe merges beat per-sub-tile merges —
    same total gathers, ~5x less bitonic-sort work (see
    scan_padded_clusters docstring).  On the protocol-gather fallback
    (compressed datasets, DynamicIVFIndex, sharded scans) the per-step
    gather transient is (B, g*sub, d) — folding the whole slot there grows
    it ~8x (e.g. 2.2 GB at slot=2112/B=2048/d=128 f32) and was never
    measured, so auto stays g=1 on that path."""
    if requested <= 0:
        return n_sub if use_scan else 1
    return min(requested, n_sub)


def _pack_layout_host(clustering, x: np.ndarray, max_posting_factor=None):
    """Pack the padded posting layout entirely host-side.

    Returns ``(centroids, rows, ids_padded, slot, n, n_clusters)`` as numpy
    arrays (``centroids`` already expanded to one row per probe unit when
    oversized clusters were chunked).  See
    :meth:`IVFIndex.assemble_from_clustering` for the slot-cap policy."""
    from ...lib import datatypes as dt
    from .clustering import pack_padded_clusters
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    k = clustering.num_centroids
    mean_slot = -(-n // max(k, 1))
    factor = max_posting_factor
    if factor is None:   # auto: only rescue pathological skew AT SCALE
        sizes = np.bincount(np.asarray(clustering.assignments), minlength=k)
        uncapped_total = k * int(dt.pad_to(max(int(sizes.max()), 1), 8))
        # small layouts stay bit-identical to one-unit-per-cluster packing
        # (golden tables / n_probes-counts-clusters parity); the cap exists
        # to stop the max-driven layout from exhausting memory (48 GB
        # measured at 10M x 96 / K=8192)
        factor = 2.0 if (uncapped_total > 4 * n
                         and uncapped_total > 5_000_000) else 0.0
    slot_cap = int(factor * mean_slot) if factor else 0
    rows, ids_padded, slot, owners = pack_padded_clusters(
        x, clustering.assignments, k, slot_cap=slot_cap)
    centroids = np.asarray(clustering.centroids, dtype=np.float32)
    if owners.shape[0] != k:         # chunked: one probe unit per chunk
        centroids = centroids[owners]
    return centroids, rows, np.asarray(ids_padded), slot, n, k


def save_packed_layout_host(config_dir: str, clustering, data, distance,
                            eltype="bfloat16", max_posting_factor=None,
                            search_parameters=None,
                            build_parameters=None) -> None:
    """Pack + persist an :class:`IVFIndex` checkpoint WITHOUT any device
    round trip.

    ``IVFIndex.save`` reads the (multi-GB at 10M) reordered dataset back
    off the device; through the remote-TPU tunnel a blocking multi-GB
    device->host read runs at ~2 MB/s (~45 min for 5 GB, PERF.md round 4).
    Building passes that already hold the host f32 array should pack and
    write host-side, then ``assemble_from_file`` the result.  The on-disk
    format is identical to :meth:`IVFIndex.save` with a dense
    ``eltype``-typed reordered dataset."""
    centroids, rows, ids_padded, slot, n, k = _pack_layout_host(
        clustering, data, max_posting_factor=max_posting_factor)
    data_dir = os.path.join(config_dir, "data")
    dctx = saveload.SaveContext(data_dir)
    rows = rows.astype(jnp.dtype(eltype), copy=False)
    dtable = saveload.save_table(
        VectorDataset.SCHEMA, VectorDataset.VERSION, {
            "name": "vector dataset",
            "binary_file": dctx.save_array(rows),
            "dims": int(rows.shape[1]),
            "num_vectors": int(rows.shape[0]),
            "eltype": str(jnp.dtype(eltype).name),
        })
    with open(os.path.join(data_dir, saveload.CONFIG_FILENAME), "w") as f:
        json.dump(dtable, f, indent=2)
    ctx = saveload.SaveContext(config_dir)
    sp = search_parameters or IVFSearchParameters()
    table = saveload.save_table(IVFIndex.SCHEMA, IVFIndex.VERSION, {
        "distance": dist_ops.as_distance(distance).value,
        "slot": int(slot),
        "num_points": int(n),
        "n_clusters": int(k),
        "centroids": ctx.save_array(centroids),
        "ids_padded": ctx.save_array(np.asarray(ids_padded, np.int32)),
        "search_parameters": sp.save_table(),
        "build_parameters": (build_parameters.save_table()
                             if build_parameters else None),
    })
    with open(os.path.join(config_dir, CONFIG_FILENAME), "w") as f:
        json.dump(table, f, indent=2)


def _poison_padding(data, ids_padded):
    """+inf the norms of the layout's padding rows so they never win.

    ``ids_padded`` has one entry per packed row (``total``), but the
    dataset's CAPACITY may be sublane-padded beyond that (bf16 rows pad to
    16-row tiles, so capacity - total can be 8): broadcasting a (total,)
    mask against (capacity,) norms crashes for such layouts (round-5
    review finding).  The mask is padded with False — capacity rows past
    the layout are padding by definition."""
    alive = np.asarray(ids_padded) >= 0
    cap = data.norms_sq.shape[0]
    mask = np.zeros(cap, dtype=bool)
    mask[: alive.shape[0]] = alive
    return dataclasses.replace(
        data, norms_sq=jnp.where(jnp.asarray(mask), data.norms_sq,
                                 jnp.inf))


def ensure_scan_layout(index, sub: int) -> bool:
    """Materialize the super-row scan layout on any padded-posting index
    (``data``/``ids_padded``/``slot`` + ``_scan_*`` cache fields): the
    shared implementation behind ``IVFIndex._ensure_scan_layout`` and
    ``InvertedIndex`` (see that method's docstring for the memory
    trade-offs and the in-jit-reshape OOM trap)."""
    if os.environ.get("SVT_IVF_SCAN_LAYOUT", "1") == "0":
        return False
    if index._scan_sub == sub and index._scan_vecs is not None:
        return True
    total = index.ids_padded.shape[0]
    dense = getattr(index.data, "vectors", None)
    if (dense is None or getattr(dense, "ndim", 0) != 2
            or not jnp.issubdtype(dense.dtype, jnp.floating)
            or dense.shape[0] < total or index.slot % sub != 0):
        return False
    d_pad = dense.shape[1]
    # drop a stale layout BEFORE building the next one: two scan
    # copies + the dataset cannot coexist at 10M scale
    index._scan_vecs = index._scan_ids = None
    index._scan_sub = 0
    reshape = jax.jit(
        lambda v, i: (v[:total].reshape(total // sub, sub * d_pad),
                      i.reshape(total // sub, sub)))
    try:
        index._scan_vecs, index._scan_ids = reshape(dense, index.ids_padded)
    except Exception:                            # noqa: BLE001
        # HBM too tight for the extra dataset-sized resident (large
        # subtiles at 10M): fall back to the protocol-gather path
        index._scan_vecs = index._scan_ids = None
        return False
    index._scan_sub = sub
    return True


def scan_padded_clusters(data, ids_padded: jax.Array, queries: jax.Array,
                         q_norms: jax.Array, probes: jax.Array,
                         probe_valid: jax.Array, *, keep: int, slot: int,
                         sub: int, distance: dist_ops.DistanceType,
                         dedup: bool = False, scan_vecs=None,
                         scan_ids=None, tiles_per_step: int = 1):
    """Posting-list scan over uniform padded clusters (search_leaves analog,
    common.h:897-925): fori over (probe, sub-tile) steps, each row-gathering
    one tile per query and folding into a running top-``keep``.

    ``probes`` (B, P) cluster ids per query; ``probe_valid`` (B, P) masks
    probes (the inverted index's epsilon cutoff uses this).

    ``dedup``: mask candidates already in the running buffer before each
    merge.  REQUIRED when posting lists replicate points across clusters
    (inverted closure assignment) — without it a replicated id merges once
    per probed copy and its duplicates crowd distinct ids out of the
    top-``keep`` (the same failure mode as the round-2 build-pool
    duplicate crowding).  Single-assignment layouts (IVF) skip the
    (B, sub, keep) compare.

    **Super-row fast path** (``scan_vecs``/``scan_ids`` given): the HBM
    gather is per-ROW limited (~9 ns/row regardless of row bytes, PERF.md
    round 2), so gathering ``sub`` individual d-wide rows per query per
    step costs ``sub`` row latencies where ONE contiguous ``sub*d``
    super-row costs one — the same fewer/larger-rows trade that made
    Vamana's packed neighborhoods fast.  Posting slots are contiguous by
    construction (unit u owns rows [u*slot, (u+1)*slot)), so the
    (total/sub, sub*d) scan layout exposes each sub-tile as a single
    gatherable row; norms are recomputed from the gathered rows instead
    of gathered separately (the norms-gather removal was +55 % serving
    QPS on Vamana, CLAUDE.md).  The layout MUST be materialized outside
    the kernel (``IVFIndex._ensure_scan_layout``): TPU arrays are
    (8,128)-tiled, so the reshape is a real re-layout — done in-kernel,
    XLA re-materializes a full-dataset temp per call (measured 5.8 GB at
    10M, OOM).  Compressed datasets (LVQ/SQ codes need per-row decode
    state) use the protocol-gather path (``scan_vecs=None``).

    ``tiles_per_step`` (g): gather g consecutive sub-tiles of the SAME
    probed cluster per fori step and fold them in one merge.  The total
    gather count is unchanged (g rows/step x steps/g); what changes is
    the sequential structure — one sort of width g*sub+keep replaces g
    sorts of width sub+keep, and the per-step gather exposes g-way
    parallelism to hide HBM latency.  Bitonic sort work scales ~log^2 of
    the width, so fewer/bigger merges win whenever the merge (not the
    matvec) dominates.  Chunks never span probes, which keeps dedup
    correct: replicated ids (inverted closure) appear at most once per
    cluster, so in-tile candidates are unique and the mask against the
    running buffer suffices."""
    b = queries.shape[0]
    n_probes = probes.shape[1]
    n_sub = slot // sub
    g = max(1, min(int(tiles_per_step), n_sub))
    while n_sub % g != 0:
        g -= 1
    chunks = n_sub // g
    init = (jnp.full((b, keep), jnp.inf, jnp.float32),
            jnp.full((b, keep), -1, jnp.int32))
    use_super = scan_vecs is not None
    if use_super:
        d_pad = scan_vecs.shape[1] // sub

    def body(step, carry):
        best_keys, best_ids = carry
        p = step // chunks
        c = step % chunks
        cluster = jnp.take_along_axis(probes, p[None, None].repeat(b, 0),
                                      axis=1)[:, 0]
        ok = jnp.take_along_axis(probe_valid, p[None, None].repeat(b, 0),
                                 axis=1)[:, 0] & (cluster >= 0)
        if use_super:
            srow = (jnp.maximum(cluster, 0) * n_sub)[:, None] + c * g + \
                jnp.arange(g, dtype=jnp.int32)[None, :]            # (B, g)
            orig_ids = jnp.take(scan_ids, srow, axis=0,
                                mode="clip").reshape(b, g * sub)
            vecs = jnp.take(scan_vecs, srow, axis=0,
                            mode="clip").reshape(b, g * sub, d_pad)
            keys = dist_ops.gathered_keys(distance, queries, vecs,
                                          query_norms_sq=q_norms)
        else:
            base = jnp.maximum(cluster, 0) * slot + c * (g * sub)
            rows = base[:, None] + \
                jnp.arange(g * sub, dtype=jnp.int32)[None, :]
            orig_ids = jnp.take(ids_padded, rows, mode="clip")  # (B, g*sub)
            vecs = data.get(rows)                            # (B, g*sub, d)
            norms = jnp.take(data.norms_sq, rows, mode="clip")
            keys = dist_ops.gathered_keys(distance, queries, vecs,
                                          gathered_norms_sq=norms,
                                          query_norms_sq=q_norms)
        keys = jnp.where((orig_ids >= 0) & ok[:, None], keys, jnp.inf)
        if dedup:
            keys = topk_ops.mask_duplicate_ids(keys, orig_ids, best_ids)
        return topk_ops.merge_smallest(best_keys, best_ids, keys,
                                       orig_ids, keep)

    return jax.lax.fori_loop(0, n_probes * chunks, body, init)


@partial(jax.jit, static_argnames=(
    "n_probes", "keep", "slot", "sub", "distance", "tiles_per_step"))
def ivf_search_kernel(centroids: jax.Array, centroid_norms: jax.Array,
                      data, ids_padded: jax.Array, queries: jax.Array,
                      *, n_probes: int, keep: int, slot: int, sub: int,
                      distance: dist_ops.DistanceType, scan_vecs=None,
                      scan_ids=None, tiles_per_step: int = 1):
    """Two-phase IVF search for a query batch.

    Returns (keys (B, keep), ids (B, keep)) in original-id space.
    """
    distance = dist_ops.as_distance(distance)
    b = queries.shape[0]
    q_norms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)

    # phase 1: centroid distances + top-n_probes (search_centroids)
    ckeys = dist_ops.pairwise_keys(distance, queries, centroids,
                                   vector_norms_sq=centroid_norms,
                                   query_norms_sq=q_norms)
    _, probes = topk_ops.smallest_k(ckeys, None, n_probes)  # (B, P)
    probe_valid = probes >= 0

    return scan_padded_clusters(data, ids_padded, queries, q_norms, probes,
                                probe_valid, keep=keep, slot=slot, sub=sub,
                                distance=distance, scan_vecs=scan_vecs,
                                scan_ids=scan_ids,
                                tiles_per_step=tiles_per_step)


@partial(jax.jit, static_argnames=("k", "distance"))
def rerank_kernel(rerank_data, queries: jax.Array, cand_keys: jax.Array,
                  cand_ids: jax.Array, *, k: int,
                  distance: dist_ops.DistanceType):
    """Full-precision re-scoring of scan survivors (the k_reorder pass)."""
    q_norms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)
    vecs = rerank_data.get(jnp.maximum(cand_ids, 0))
    norms = jnp.take(rerank_data.norms_sq, jnp.maximum(cand_ids, 0),
                     mode="clip")
    keys = dist_ops.gathered_keys(distance, queries, vecs,
                                  gathered_norms_sq=norms,
                                  query_norms_sq=q_norms)
    keys = jnp.where(cand_ids >= 0, keys, jnp.inf)
    return topk_ops.smallest_k(keys, cand_ids, k)


@partial(jax.jit, static_argnames=(
    "k", "n_probes", "keep", "slot", "sub", "distance", "rerank",
    "tiles_per_step"))
def _ivf_serve_batch(centroids, centroid_norms, data, ids_padded,
                     rerank_data, q, q_scale=None, scan_vecs=None,
                     scan_ids=None,
                     *, k: int, n_probes: int, keep: int,
                     slot: int, sub: int, distance: dist_ops.DistanceType,
                     rerank: bool, tiles_per_step: int = 1):
    """One fully-fused IVF serving dispatch: centroid select + posting scan
    + (optional) rerank + key->distance conversion, mirroring Vamana's
    `_search_batch` (index/vamana/index.py) — the host does nothing between
    dispatches but enqueue, and ``q`` may arrive in a half-width (or int8 +
    per-query scale) upload dtype (cast back to f32 here)."""
    from ..vamana.index import dequantize_queries
    q = dequantize_queries(q, q_scale)
    keys, ids = ivf_search_kernel(
        centroids, centroid_norms, data, ids_padded, q,
        n_probes=n_probes, keep=keep, slot=slot, sub=sub, distance=distance,
        scan_vecs=scan_vecs, scan_ids=scan_ids,
        tiles_per_step=tiles_per_step)
    if rerank:
        keys, ids = rerank_kernel(rerank_data, q, keys, ids, k=k,
                                  distance=distance)
    else:
        keys, ids = keys[:, :k], ids[:, :k]
    return ids, dist_ops.value_from_key(distance, keys)


class IVFIndex:
    """Static IVF index over padded dense clusters."""

    SCHEMA = "ivf_index_parameters"
    VERSION = saveload.Version(0, 0, 1)

    def __init__(self, centroids, data, ids_padded, slot: int, n: int,
                 distance, search_parameters: Optional[IVFSearchParameters]
                 = None, build_parameters: Optional[IVFBuildParameters] = None,
                 rerank_data=None, query_batch_size: int = 2048,
                 scan_subtile: int = 256, logger=None,
                 n_clusters=None):
        centroids = np.asarray(centroids, dtype=np.float32)
        d_pad = data.padded_dim
        if centroids.shape[1] < d_pad:   # pad to the dataset's lane width
            centroids = np.pad(
                centroids, ((0, 0), (0, d_pad - centroids.shape[1])))
        self.centroids = jnp.asarray(centroids)
        self.centroid_norms = jnp.sum(self.centroids ** 2, axis=-1)
        self.data = data                      # reordered padded dataset
        self.ids_padded = jnp.asarray(ids_padded, dtype=jnp.int32)
        self.slot = slot
        self.n = n
        self.distance = dist_ops.as_distance(distance)
        self.search_parameters = search_parameters or IVFSearchParameters()
        self.build_parameters = build_parameters
        self.rerank_data = rerank_data
        self.query_batch_size = query_batch_size
        self.scan_subtile = scan_subtile
        # sub-tiles of one probed cluster folded per scan step (0 = auto);
        # see scan_padded_clusters: fewer/bigger merges at equal gathers
        self.scan_tiles_per_step = int(
            os.environ.get("SVT_IVF_TILES_PER_STEP", "0"))
        self.logger = logger
        # chunked layouts have more probe units than logical clusters
        # (oversized clusters split into units replicating their centroid)
        self.n_clusters = int(n_clusters if n_clusters is not None
                              else self.centroids.shape[0])
        self._scan_vecs = None      # (total/sub, sub*d_pad) super-row layout
        self._scan_ids = None       # (total/sub, sub)
        self._scan_sub = 0

    def _ensure_scan_layout(self, sub: int) -> bool:
        """Materialize the super-row scan layout for ``sub`` once.

        TPU arrays are (8,128)-tiled: the (total, d) -> (total/sub, sub*d)
        reshape is a real re-layout, so it must happen ONCE here — inside
        the serve executable XLA re-materializes a full-dataset temp per
        call (measured 5.8 GB at 10M bf16, OOM at larger subtiles).
        Costs one extra dataset-sized HBM resident; disable with
        ``SVT_IVF_SCAN_LAYOUT=0`` when memory is tighter than the ~10x
        serving win (measured 648 -> 6303 QPS at 10M, sub=192).  Only
        plain dense datasets qualify (compressed codes need per-row
        decode state)."""
        return ensure_scan_layout(self, sub)

    # -- assembly ----------------------------------------------------------------
    @classmethod
    def assemble_from_clustering(cls, clustering: Clustering, data,
                                 distance, dataset_cls=VectorDataset,
                                 rerank: bool = False,
                                 max_posting_factor=None,
                                 **kwargs) -> "IVFIndex":
        """Pack posting lists into the padded reordered layout
        (reference assemble path, ivf.cpp:207-380 + clustering.h:314).

        ``max_posting_factor`` caps the per-probe-unit slot at
        ``factor * ceil(n / K)`` by chunking oversized clusters (probe
        units replicate their cluster's centroid) — without the cap the
        dense layout's memory is K * LARGEST posting, which blows up
        under cluster-size skew (measured 48 GB at 10M x 96 / K=8192),
        while the capped layout wastes at most ~factor x n rows no
        matter the skew.  ``None`` (default) = auto: cap at 2x mean ONLY
        when the uncapped layout would waste > 4x n rows, so balanced
        layouts stay bit-identical to the one-unit-per-cluster packing
        (golden tables, sharded parity).  0 = never cap."""
        x = data.to_numpy() if hasattr(data, "to_numpy") else \
            np.asarray(data, dtype=np.float32)
        centroids, rows, ids_padded, slot, n, k = _pack_layout_host(
            clustering, x, max_posting_factor=max_posting_factor)
        total = ids_padded.shape[0]

        reordered = dataset_cls.compress(rows) if hasattr(
            dataset_cls, "compress") else dataset_cls.from_array(rows)
        reordered = _poison_padding(reordered, ids_padded)
        rerank_data = VectorDataset.from_array(x) if rerank else None
        waste = total / max(n, 1)
        logger = kwargs.get("logger")
        if logger is not None:
            logger.info("ivf assemble: K=%d slot=%d padding factor %.2fx",
                        k, slot, waste)
        return cls(centroids, reordered, ids_padded, slot, n,
                   distance, rerank_data=rerank_data, n_clusters=k,
                   **kwargs)

    @classmethod
    def build(cls, build_parameters: IVFBuildParameters, data, distance,
              **kwargs) -> "IVFIndex":
        """Train + assemble in one call (reference auto-build path)."""
        clustering = Clustering.build(build_parameters, data)
        index = cls.assemble_from_clustering(clustering, data, distance,
                                             **kwargs)
        index.build_parameters = build_parameters
        return index

    # -- properties -----------------------------------------------------------------
    @property
    def size(self) -> int:
        return self.n

    @property
    def dimensions(self) -> int:
        return self.data.dim

    @property
    def num_centroids(self) -> int:
        """Logical cluster count (reference semantics)."""
        return self.n_clusters

    @property
    def num_probe_units(self) -> int:
        """Probe units = centroid rows; > num_centroids when oversized
        clusters were chunked (n_probes counts these)."""
        return self.centroids.shape[0]

    # -- search ------------------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[IVFSearchParameters] = None,
               cancel=None) -> QueryResult:
        """``cancel``: optional zero-arg predicate checked between query
        batch dispatches (the reference threads cancel predicates through
        every search entry point — tests/integration/cancel.cpp)."""
        return self.search_async(queries, k, parameters=parameters,
                                 cancel=cancel).result()

    def search_async(self, queries, k: int,
                     parameters: Optional[IVFSearchParameters] = None,
                     cancel=None):
        """Dispatch a batch search and return a ``PendingSearch``.

        Same cross-call pipelining as Vamana's ``search_async``
        (index/vamana/index.py): all device work and async device->host
        copies start before this returns, so call N+1's host pad/upload
        rides the tunnel while call N computes — the TPU analog of the
        reference's threadpool-saturated serving (index.h:556-603)."""
        from ..vamana.index import (PendingSearch, _BatchPlan,
                                    prepare_query_upload)
        from ...lib.exceptions import check_cancel
        params = parameters or self.search_parameters
        n_probes = min(params.n_probes, self.num_probe_units)
        keep = max(k * params.k_reorder, k)
        sub = _pick_subtile(self.slot, self.scan_subtile)
        use_scan = self._ensure_scan_layout(sub)
        tiles = _resolve_tiles_per_step(self.scan_tiles_per_step,
                                        self.slot // sub, use_scan)

        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self.data.dim:
            raise ValueError(f"query dim {dim} != dataset dim "
                             f"{self.data.dim}")
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_vals = np.empty((nq, k), dtype=np.float32)
        rerank = self.rerank_data is not None and keep > k
        # ONE host-side pad of the whole query set, half-width per-batch
        # ASYNC uploads, one fused executable per equal-shape batch, and
        # every device->host copy started before the first blocking read —
        # the same serving pipeline as Vamana's search_async
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=plan.rows * plan.n_batches,
                               d_pad=self.data.padded_dim)
        q_host, q_scale_host = prepare_query_upload(
            q_host, getattr(self, "query_upload_dtype", None))
        pending = []
        for i in range(plan.n_batches):
            check_cancel(cancel)
            q_i = jnp.asarray(q_host[i * plan.rows:(i + 1) * plan.rows])
            scale_i = (None if q_scale_host is None else
                       jnp.asarray(q_scale_host[i * plan.rows:
                                                (i + 1) * plan.rows]))
            ids, vals = _ivf_serve_batch(
                self.centroids, self.centroid_norms, self.data,
                self.ids_padded, self.rerank_data if rerank else None, q_i,
                scale_i,
                self._scan_vecs if use_scan else None,
                self._scan_ids if use_scan else None,
                k=k, n_probes=n_probes, keep=keep, slot=self.slot, sub=sub,
                distance=self.distance, rerank=rerank,
                tiles_per_step=tiles)
            pending.append((i * plan.rows, ids, vals))
        for _start, ids, vals in pending:
            ids.copy_to_host_async()
            vals.copy_to_host_async()
        return PendingSearch(pending=pending, rows=plan.rows, nq=nq,
                             out_ids=out_ids, out_vals=out_vals)

    # -- persistence --------------------------------------------------------------------
    def save(self, config_dir: str, data_dir: Optional[str] = None) -> None:
        data_dir = data_dir or os.path.join(config_dir, "data")
        os.makedirs(config_dir, exist_ok=True)
        saveload.save_to_disk(self.data, data_dir)
        ctx = saveload.SaveContext(config_dir)
        table = saveload.save_table(self.SCHEMA, self.VERSION, {
            "distance": self.distance.value,
            "slot": self.slot,
            "num_points": self.n,
            "n_clusters": self.n_clusters,
            "centroids": ctx.save_array(np.asarray(self.centroids)),
            "ids_padded": ctx.save_array(np.asarray(self.ids_padded)),
            "search_parameters": self.search_parameters.save_table(),
            "build_parameters": (self.build_parameters.save_table()
                                 if self.build_parameters else None),
        })
        with open(os.path.join(config_dir, CONFIG_FILENAME), "w") as f:
            json.dump(table, f, indent=2)

    @classmethod
    def assemble_from_file(cls, config_dir: str,
                           data_dir: Optional[str] = None,
                           **kwargs) -> "IVFIndex":
        data_dir = data_dir or os.path.join(config_dir, "data")
        with open(os.path.join(config_dir, CONFIG_FILENAME)) as f:
            table = json.load(f)
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        ctx = saveload.LoadContext(config_dir)
        from ...core.loading import dispatch_load
        data = dispatch_load(data_dir)
        data = _poison_padding(data, ctx.load_array(table["ids_padded"]))
        sp = IVFSearchParameters.from_table(table["search_parameters"])
        bp = (IVFBuildParameters.from_table(table["build_parameters"])
              if table.get("build_parameters") else None)
        return cls(ctx.load_array(table["centroids"]), data,
                   ctx.load_array(table["ids_padded"]), table["slot"],
                   table["num_points"], table["distance"],
                   search_parameters=sp, build_parameters=bp,
                   n_clusters=table.get("n_clusters"), **kwargs)
