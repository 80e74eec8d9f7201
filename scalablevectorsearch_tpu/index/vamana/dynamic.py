"""Mutable (dynamic) Vamana index: add / soft-delete / consolidate / compact.

TPU-native analog of the reference's ``MutableVamanaIndex``
(``include/svs/index/vamana/dynamic_index.h:111``):

* slot lifecycle Empty / Valid / Deleted (``dynamic_index.h:67``) tracked on
  the host plus a device ``deleted`` mask consulted at result extraction
  (the analog of the predicated search buffer, ``dynamic_search_buffer.h`` —
  deleted nodes remain traversable until consolidation but never surface in
  results);
* external<->internal id translation at the API boundary
  (``IDTranslator``, ``dynamic_index.h:423-443``);
* ``add_points`` = slot reuse/growth -> scatter rows -> clear adjacency ->
  incremental build rounds over the new slots only
  (``dynamic_index.h:630-723``);
* ``delete_entries`` = soft delete (``dynamic_index.h:747-760``);
* ``consolidate`` = batched re-pruning of vertices adjacent to deleted nodes
  over {alive neighbors} ∪ {alive neighbors of deleted neighbors}
  (``consolidate.h:139-310``, two-phase read-then-commit — exactly the
  batched formulation used here);
* ``compact`` = dense remap of slots (``dynamic_index.h:791-884``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.data import VectorDataset
from ...core.graph import NeighborGraph
from ...core.query_result import QueryResult
from ...core.translation import IDTranslator
from ...lib import datatypes as dt
from ...lib import saveload
from ...lib import logging as svs_logging
from ...ops import distance as dist_ops
from ...ops import topk as topk_ops
from . import build as build_mod
from . import search as search_mod
from .params import VamanaBuildParameters, VamanaSearchParameters

SLOT_EMPTY, SLOT_VALID, SLOT_DELETED = 0, 1, 2


@jax.jit
def _affected_by_deleted(adjacency: jax.Array, deleted_mask: jax.Array,
                         valid_mask: jax.Array) -> jax.Array:
    """(n,) bool: valid vertices with at least one deleted neighbor
    (consolidate.h:139 candidate scan, computed on device)."""
    neigh_del = (jnp.take(deleted_mask, jnp.maximum(adjacency, 0),
                          mode="clip") & (adjacency >= 0))
    return neigh_del.any(axis=1) & valid_mask[: adjacency.shape[0]]


@partial(jax.jit, static_argnames=("prune_to", "distance",
                                   "max_degree", "prune_chunk", "pool_cap"))
def consolidate_round(graph: NeighborGraph, data: VectorDataset,
                      node_ids: jax.Array, node_valid: jax.Array,
                      deleted_mask: jax.Array, *, prune_to: int,
                      alpha: float, distance, max_degree: int,
                      prune_chunk: int, pool_cap: int) -> NeighborGraph:
    """Re-prune one batch of vertices that touch deleted nodes
    (consolidate.h:139-310): candidates = alive neighbors ∪ alive neighbors
    of deleted neighbors, top-``pool_cap`` by distance, RobustPrune with the
    index alpha (consolidate.h:275-278 uses params.alpha)."""
    r = graph.max_degree
    adj = graph.neighbors(jnp.maximum(node_ids, 0))            # (B, R)
    adj_deleted = jnp.take(deleted_mask, jnp.maximum(adj, 0),
                           mode="clip") & (adj >= 0)
    # second hop, only through deleted neighbors
    hop2 = graph.neighbors(jnp.maximum(adj, 0).reshape(-1)).reshape(
        adj.shape[0], r * r)
    hop2 = jnp.where(jnp.repeat(adj_deleted, r, axis=1), hop2, -1)
    cand = jnp.concatenate([jnp.where(adj_deleted, -1, adj), hop2], axis=1)
    cand_deleted = jnp.take(deleted_mask, jnp.maximum(cand, 0), mode="clip")
    cand = jnp.where(cand_deleted | (cand < 0), -1, cand)

    queries = data.get(node_ids)
    # protocol accessor (not a direct field read) so shard views can answer
    # with a collective (parallel/sharded.py ShardedDataShard.norms_of)
    q_norms = data.norms_of(node_ids)
    keys = build_mod._score_against(data, distance, queries, q_norms, cand)
    keys = topk_ops.mask_first_duplicates(keys, cand)
    keys = jnp.where(node_valid[:, None], keys, jnp.inf)
    keys, cand = topk_ops.smallest_k(keys, cand, pool_cap)

    rows, degs = build_mod._prune_pools(
        data, cand, keys, node_ids, alpha, prune_to, distance, prune_chunk)
    pad_cols = max_degree - rows.shape[1]
    if pad_cols > 0:
        rows = jnp.pad(rows, ((0, 0), (0, pad_cols)), constant_values=-1)
    commit = jnp.where(node_valid, node_ids, graph.capacity)
    return graph.replace_rows(commit, rows, degs)


class MutableVamanaIndex:
    """Dynamic Vamana index over blocked device storage."""

    def __init__(self, parameters: VamanaBuildParameters, data, external_ids,
                 distance, *, capacity: Optional[int] = None,
                 query_batch_size: int = 2048, pop_width: int = 4,
                 logger=None):
        x = np.asarray(data, dtype=np.float32)
        n, dim = x.shape
        self.distance = dist_ops.as_distance(distance)
        self.parameters = parameters.resolved(self.distance)
        self.logger = svs_logging.as_logger(logger)
        self.query_batch_size = query_batch_size
        self.pop_width = pop_width

        cap = dt.padded_count(capacity if capacity is not None
                              else max(2 * n, 64), np.float32)
        self.data = VectorDataset.from_array(x, capacity=cap)
        # n tracks the high-water slot; storage rows past it are untouched
        self.status = np.full(cap, SLOT_EMPTY, dtype=np.int8)
        self.status[:n] = SLOT_VALID
        self.deleted_mask = jnp.zeros((cap,), dtype=bool)
        self.translator = IDTranslator(cap)
        self.translator.insert(np.asarray(external_ids, dtype=np.int64),
                               np.arange(n, dtype=np.int64))
        self._search_parameters = VamanaSearchParameters()
        self._packed = None          # packed neighborhoods (lazy)
        self._packed_dtype = None    # None => packed serving disabled
        self._entry_sampler = None   # per-query entries (lazy; see enable_)
        self._sampler_cfg = None
        self.tail_frac = 4           # lockstep tail compaction (search.py)

        # initial construction: the full two-pass static builder, then pad
        # the graph out to the blocked capacity
        graph, entry = build_mod.build_graph(
            self.data, self.parameters, self.distance, logger=self.logger,
            pop_width=4, tail_frac=4)
        self.graph = graph.with_capacity(cap)
        self.entry_point = entry

    # -- internals ------------------------------------------------------------
    @property
    def _high_water(self) -> int:
        return self.data.n

    def _build_over(self, slots: np.ndarray,
                    batch_size: Optional[int] = None) -> None:
        """Incremental construction over specific slots (the add_points tail
        of dynamic_index.h:630-723 — same fused rounds as the static build)."""
        p = self.parameters
        n_slots = slots.size
        if n_slots == 0:
            return
        b = batch_size or build_mod.default_batch_size(max(n_slots, 1))
        b = min(b, dt.pad_to(n_slots, 8))
        entry_ids = jnp.asarray([self.entry_point], dtype=jnp.int32)
        window = p.window_size
        max_iters = search_mod.default_max_iters(window)
        for start in range(0, n_slots, b):
            chunk = slots[start: start + b]
            ids = np.full(b, chunk[0], dtype=np.int32)
            ids[: chunk.size] = chunk
            valid = np.zeros(b, dtype=bool)
            valid[: chunk.size] = True
            self.graph, _ = build_mod.build_round(
                self.graph, self.data, jnp.asarray(ids), jnp.asarray(valid),
                entry_ids, window=window, capacity=window,
                max_iters=max_iters, distance=self.distance,
                pool_size=p.max_candidate_pool_size,
                gen_alpha=float(p.alpha), rev_alpha=float(p.alpha),
                prune_to=p.prune_to,
                max_degree=p.graph_max_degree, prune_chunk=128,
                pop_width=4, tail_frac=4)

    # -- properties -------------------------------------------------------------
    @property
    def size(self) -> int:
        return int((self.status == SLOT_VALID).sum())

    @property
    def dimensions(self) -> int:
        return self.data.dim

    @property
    def search_parameters(self) -> VamanaSearchParameters:
        return self._search_parameters

    @search_parameters.setter
    def search_parameters(self, params) -> None:
        self._search_parameters = params

    @property
    def search_window_size(self) -> int:
        return self._search_parameters.buffer_config.search_window_size

    @search_window_size.setter
    def search_window_size(self, w: int) -> None:
        self._search_parameters = self._search_parameters.with_window(w)

    # -- packed-neighborhood serving ------------------------------------------
    def enable_packed_serving(self, dtype=jnp.bfloat16,
                              chunk: int = 65536) -> None:
        """Inline neighbor vectors for gather-bound serving (see
        ``packed.pack_neighborhoods``).  Mutations that rewrite adjacency or
        vectors (add / consolidate / compact) invalidate the packed array;
        it is rebuilt lazily on the next search.  Soft deletes do NOT
        invalidate it — deleted nodes stay traversable until consolidation
        by design (dynamic_index.h soft-delete semantics), and the packed
        contents map adjacency to vectors, which soft delete leaves intact."""
        self._packed_dtype = dtype
        self._packed_chunk = chunk
        self._packed = None

    def disable_packed_serving(self) -> None:
        self._packed = None
        self._packed_dtype = None

    # -- per-query entry selection ---------------------------------------------
    def enable_entry_sampler(self, n_samples: Optional[int] = None,
                             n_entries: int = 1, seed: int = 0) -> None:
        """Per-query entry selection from a resident sample of the LIVE
        slots (see index.py ``VamanaIndex.enable_entry_sampler`` and
        entry.py; ``None`` auto-scales with the live count at each
        rebuild).  Every mutation invalidates the sample — slot reuse can
        silently repoint a sampled id at a different vector, and
        consolidation clears deleted rows' adjacency (a sampled entry with
        no out-edges strands its queries) — so it is rebuilt lazily on the
        next search from the then-current VALID slots."""
        self._sampler_cfg = (n_samples, n_entries, seed)
        self._entry_sampler = None

    def disable_entry_sampler(self) -> None:
        self._sampler_cfg = None
        self._entry_sampler = None

    def _ensure_sampler(self):
        cfg = getattr(self, "_sampler_cfg", None)
        if cfg is None:
            return None, 1
        if self._entry_sampler is None:
            from .entry import auto_samples, build_sampler
            n_samples, n_entries, seed = cfg
            alive = np.nonzero(self.status == SLOT_VALID)[0]
            if n_samples is None:
                n_samples = auto_samples(alive.size)
            rng = np.random.default_rng(seed)
            size = min(n_samples, alive.size)
            ids = rng.choice(alive, size=size, replace=False) \
                if size else np.asarray([self.entry_point])
            self._entry_sampler = build_sampler(self.data, n_samples,
                                                ids=ids)
        return self._entry_sampler, cfg[1]

    def _invalidate_packed(self) -> None:
        self._packed = None
        self._entry_sampler = None

    def _ensure_packed(self):
        if self._packed_dtype is None:
            return None
        if self._packed is None:
            from .packed import pack_neighborhoods
            self._packed = pack_neighborhoods(
                self.graph, self.data, self._packed_dtype,
                chunk=self._packed_chunk)
        return self._packed

    def all_ids(self) -> np.ndarray:
        """External ids currently in the index (reference all_ids)."""
        return np.sort(self.translator.all_external_ids())

    def has_id(self, external_id: int) -> bool:
        return external_id in self.translator

    # -- search -----------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[VamanaSearchParameters] = None,
               cancel=None) -> QueryResult:
        """``cancel``: optional zero-arg predicate checked between query
        batch dispatches (reference cancel hooks,
        tests/integration/cancel.cpp)."""
        return self.search_async(queries, k, parameters=parameters,
                                 cancel=cancel).result()

    def search_async(self, queries, k: int,
                     parameters: Optional[VamanaSearchParameters] = None,
                     cancel=None):
        """Dispatch-only search returning a PendingSearch (see
        index.py ``VamanaIndex.search_async``): overlap the next call's
        host-side pad/upload with this call's device compute."""
        from ...lib.exceptions import check_cancel
        params = parameters or self._search_parameters
        cfg = params.buffer_config
        # deleted entries occupy beam slots until consolidation; widen the
        # retained capacity so k live results survive extraction
        # sub-k pop horizons are legal (capacity, not window, guarantees k
        # results — see index.py search_async and search_buffer.h:39);
        # single-arg configs keep the reference's k-floor (index.h:582)
        # clamp to the traversable slot count (k > n pads result columns;
        # see index.py search_async)
        k_eff = min(k, self.data.n)
        window = max(cfg.search_window_size, 1)
        if cfg.capacity_defaulted and cfg.search_buffer_capacity < k_eff:
            window = k_eff
        capacity = max(cfg.search_buffer_capacity, window, 2 * k_eff)
        max_iters = params.resolved_max_iters()
        visited_size = (self.pop_width * max_iters
                        if params.visited_set else 0)

        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self.data.dim:
            raise ValueError(f"query dim {dim} != dataset dim {self.data.dim}")
        from .index import _BatchPlan
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        entry_ids = jnp.asarray([self.entry_point], dtype=jnp.int32)
        packed = self._ensure_packed()
        sampler, n_entries = self._ensure_sampler()
        out_ids = np.full((nq, k), -1, dtype=np.int64)
        out_vals = np.full((nq, k), np.inf, dtype=np.float32)
        # one host-side pad, then per-batch ASYNC uploads (batch i+1's
        # transfer overlaps batch i's compute); per batch, one fused
        # dispatch (search + deleted-drop + key conversion); all
        # device->host copies start before the first blocking read — each
        # blocking transfer costs a tunnel round trip (see index.py search)
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=plan.rows * plan.n_batches,
                               d_pad=self.data.padded_dim)
        from .index import prepare_query_upload
        q_host, q_scale_host = prepare_query_upload(
            q_host, getattr(self, "query_upload_dtype", None))
        pending = []
        for i in range(plan.n_batches):
            check_cancel(cancel)
            q_i = jnp.asarray(q_host[i * plan.rows:(i + 1) * plan.rows])
            scale_i = (None if q_scale_host is None else
                       jnp.asarray(q_scale_host[i * plan.rows:
                                                (i + 1) * plan.rows]))
            ids, vals = _dyn_search_batch(
                self.graph, self.data, packed, self.deleted_mask, sampler,
                q_i, scale_i, entry_ids,
                k=k_eff, window=window, capacity=capacity,
                max_iters=max_iters, distance=self.distance,
                pop_width=self.pop_width, tail_frac=self.tail_frac,
                visited_size=visited_size, n_entries=n_entries)
            pending.append((i * plan.rows, ids, vals))
        for _start, ids, vals in pending:
            ids.copy_to_host_async()
            vals.copy_to_host_async()
        from .index import PendingSearch
        translate = lambda slots: np.where(
            slots >= 0, self.translator.to_external(slots), -1)
        return PendingSearch(pending=pending, rows=plan.rows, nq=nq,
                             out_ids=out_ids, out_vals=out_vals,
                             translate_ids=translate)

    # -- mutation ------------------------------------------------------------------
    def add_points(self, points, external_ids) -> np.ndarray:
        """Insert vectors under new external ids; returns assigned slots."""
        points = np.asarray(points, dtype=np.float32)
        external_ids = np.asarray(external_ids, dtype=np.int64)
        if points.shape[0] != external_ids.size:
            raise ValueError("points / external_ids length mismatch")
        m = points.shape[0]

        empty = np.nonzero(self.status == SLOT_EMPTY)[0]
        empty = empty[empty < self._high_water]          # reuse first
        reuse = empty[:m]
        n_new = m - reuse.size
        high = self._high_water
        slots = np.concatenate([
            reuse, np.arange(high, high + n_new)]).astype(np.int64)

        if high + n_new > self.data.capacity:
            new_cap = dt.padded_count(
                max(2 * self.data.capacity, high + n_new), np.float32)
            self.data = self.data.with_capacity(new_cap)
            self.graph = self.graph.with_capacity(new_cap)
            self.deleted_mask = jnp.pad(
                self.deleted_mask, (0, new_cap - self.status.size))
            self.status = np.pad(self.status,
                                 (0, new_cap - self.status.size))
            grow = self.translator  # dict-based; grows automatically

        self.translator.insert(external_ids, slots)
        rows = jnp.asarray(dt.pad_matrix(
            points, n_pad=points.shape[0], d_pad=self.data.padded_dim))
        self.data = self.data.scatter_rows(
            jnp.asarray(slots), rows, new_n=max(high, high + n_new))
        self.graph = self.graph.clear_rows(jnp.asarray(slots))
        import dataclasses as _dc
        self.graph = _dc.replace(self.graph, n=self.data.n)
        self.status[slots] = SLOT_VALID
        self.deleted_mask = self.deleted_mask.at[jnp.asarray(slots)].set(False)
        self._build_over(slots)
        self._invalidate_packed()
        return slots

    def delete_points(self, external_ids) -> None:
        """Soft delete (dynamic_index.h:747-760): entries stop surfacing in
        results immediately; graph cleanup is deferred to consolidate()."""
        slots = self.translator.remove(external_ids)
        self.status[slots] = SLOT_DELETED
        self.deleted_mask = self.deleted_mask.at[jnp.asarray(slots)].set(True)
        if self.status[self.entry_point] != SLOT_VALID:
            self._reset_entry_point()

    def consolidate(self, batch_size: int = 1024) -> None:
        """Remove deleted vertices from all adjacency lists by re-pruning
        affected vertices, then release the slots (consolidate.h:139-310)."""
        deleted = np.nonzero(self.status == SLOT_DELETED)[0]
        if deleted.size == 0:
            return
        # affected = valid vertices with >= 1 deleted neighbor.  Computed on
        # device so only an (n,) bool mask crosses the tunnel instead of the
        # full (n, R) int32 adjacency (O(n) vs O(n*R*4) bytes — at 100Mx32
        # that is ~100 MB vs ~13 GB).
        valid_mask = jnp.asarray(self.status == SLOT_VALID)
        affected = np.nonzero(np.asarray(_affected_by_deleted(
            self.graph.adjacency, self.deleted_mask, valid_mask)))[0]

        r = self.graph.max_degree
        pool_cap = min(r * (r + 1), 4 * r)   # top candidates kept for prune
        for start in range(0, affected.size, batch_size):
            chunk = affected[start: start + batch_size]
            ids = np.full(batch_size, 0, dtype=np.int32)
            ids[: chunk.size] = chunk
            valid = np.zeros(batch_size, dtype=bool)
            valid[: chunk.size] = True
            self.graph = consolidate_round(
                self.graph, self.data, jnp.asarray(ids), jnp.asarray(valid),
                self.deleted_mask, prune_to=self.parameters.prune_to,
                alpha=float(self.parameters.alpha),
                distance=self.distance, max_degree=r, prune_chunk=128,
                pool_cap=pool_cap)
        # clear + free the deleted slots
        self.graph = self.graph.clear_rows(jnp.asarray(deleted))
        self.status[deleted] = SLOT_EMPTY
        self.deleted_mask = self.deleted_mask.at[jnp.asarray(deleted)].set(
            False)
        self._invalidate_packed()

    def compact(self) -> None:
        """Dense remap: drop empty slots, shrink high-water
        (dynamic_index.h:791-884 batched gather-remap formulation).

        Runs entirely on device: only the O(n) permutation crosses the
        tunnel; the O(n*(R+d)) adjacency/vector bytes are gather-remapped
        in one jit call (the reference's compact likewise moves rows
        in-place without round-tripping them through the API layer)."""
        high = self._high_water
        alive = np.nonzero(self.status[:high] != SLOT_EMPTY)[0]
        if alive.size == high:
            return
        old_to_new = np.full(self.data.capacity + 1, -1, dtype=np.int64)
        old_to_new[alive] = np.arange(alive.size)
        new_n = alive.size

        perm = np.zeros(self.data.capacity, dtype=np.int32)
        perm[:new_n] = alive
        adj, degs, vecs, norms = _compact_kernel(
            self.graph.adjacency, self.data.vectors, self.data.norms_sq,
            jnp.asarray(perm),
            jnp.asarray(old_to_new[:-1].astype(np.int32)),
            jnp.int32(new_n))
        import dataclasses as dc
        self.data = dc.replace(self.data, vectors=vecs, norms_sq=norms,
                               n=new_n)
        self.graph = dc.replace(self.graph, adjacency=adj, degrees=degs,
                                n=new_n)
        new_status = np.full(self.status.size, SLOT_EMPTY, dtype=np.int8)
        new_status[:new_n] = self.status[:high][alive]
        self.status = new_status
        self.deleted_mask = jnp.asarray(
            new_status == SLOT_DELETED)
        self.translator.remap(old_to_new)
        self._invalidate_packed()
        self._reset_entry_point()

    # -- distance + persistence ---------------------------------------------
    def get_distance(self, external_id: int, query) -> float:
        """Distance between one live entry and a query (reference
        dynamic_vamana.h:55)."""
        slot = int(self.translator.to_internal([external_id])[0])
        vec = np.asarray(self.data.get_f32(jnp.asarray([slot])))[0,
                                                                 :self.data.dim]
        q = np.asarray(query, dtype=np.float32).reshape(-1)
        if q.shape[0] != self.data.dim:
            raise ValueError(f"query dim {q.shape[0]} != {self.data.dim}")
        from ...ops.distance import DistanceType
        if self.distance == DistanceType.L2:
            return float(((q - vec) ** 2).sum())
        ip = float(q @ vec)
        if self.distance == DistanceType.MIP:
            return ip
        return ip / max(float(np.linalg.norm(q) * np.linalg.norm(vec)),
                        1e-30)

    SCHEMA = "dynamic_vamana_index_parameters"
    VERSION = saveload.Version(0, 0, 2)  # 0.0.2: optional entry_sampler

    def save(self, config_dir: str) -> None:
        """Persist index + slot state + translation (the reference requires
        consolidation before saving, dynamic_index.h:270 comment; we save
        the deleted mask instead so any state is saveable)."""
        import json, os
        os.makedirs(config_dir, exist_ok=True)
        saveload.save_to_disk(self.data, os.path.join(config_dir, "data"))
        saveload.save_to_disk(self.graph, os.path.join(config_dir, "graph"))
        ctx = saveload.SaveContext(config_dir)
        high = self._high_water
        ext = self.translator.to_external(np.arange(high))
        table = saveload.save_table(self.SCHEMA, self.VERSION, {
            "distance": self.distance.value,
            "entry_point": int(self.entry_point),
            "status": ctx.save_array(self.status[:high]),
            "external_ids": ctx.save_array(ext),
            "build_parameters": __import__("dataclasses").asdict(
                self.parameters),
            "entry_sampler": None if self._sampler_cfg is None else {
                "n_samples": self._sampler_cfg[0],
                "n_entries": self._sampler_cfg[1],
                "seed": self._sampler_cfg[2]},
        })
        with open(os.path.join(config_dir, "dynamic_vamana_config.json"),
                  "w") as f:
            json.dump(table, f, indent=2)

    @classmethod
    def assemble(cls, config_dir: str, **kwargs) -> "MutableVamanaIndex":
        import json, os
        with open(os.path.join(config_dir,
                               "dynamic_vamana_config.json")) as f:
            table = json.load(f)
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        ctx = saveload.LoadContext(config_dir)
        from ...core.loading import dispatch_load
        data = dispatch_load(os.path.join(config_dir, "data"))
        graph = saveload.load_from_disk(
            NeighborGraph, os.path.join(config_dir, "graph"))
        status = ctx.load_array(table["status"])
        ext = ctx.load_array(table["external_ids"])
        params = VamanaBuildParameters(**{
            k: v for k, v in table["build_parameters"].items()
            if k in {f.name for f in __import__("dataclasses").fields(
                VamanaBuildParameters)}})
        obj = cls.__new__(cls)
        obj.distance = dist_ops.as_distance(table["distance"])
        obj.parameters = params
        obj.logger = svs_logging.as_logger(kwargs.get("logger"))
        obj.query_batch_size = kwargs.get("query_batch_size", 2048)
        obj.pop_width = kwargs.get("pop_width", 4)
        cap = data.capacity
        obj.data = data
        obj.graph = graph.with_capacity(cap)
        obj.status = np.zeros(cap, dtype=np.int8)
        obj.status[: status.shape[0]] = status
        obj.deleted_mask = jnp.asarray(obj.status == SLOT_DELETED)
        obj.translator = IDTranslator(cap)
        live = np.nonzero((status == SLOT_VALID)
                          | (status == SLOT_DELETED))[0]
        valid_live = live[status[live] == SLOT_VALID]
        obj.translator.insert(ext[valid_live], valid_live)
        obj.entry_point = int(table["entry_point"])
        obj._search_parameters = VamanaSearchParameters()
        obj._packed = None
        obj._packed_dtype = None
        obj._entry_sampler = None
        obj._sampler_cfg = None
        obj.tail_frac = 4
        sampler_cfg = table.get("entry_sampler")
        if sampler_cfg:
            obj.enable_entry_sampler(**sampler_cfg)
        return obj

    def _reset_entry_point(self) -> None:
        alive = np.nonzero(self.status == SLOT_VALID)[0]
        if alive.size == 0:
            self.entry_point = 0
            return
        # medioid over alive rows only: poison others' norms
        import dataclasses as dc
        mask = jnp.zeros((self.data.capacity,), bool).at[
            jnp.asarray(alive)].set(True)
        masked = dc.replace(self.data, norms_sq=jnp.where(
            mask, self.data.norms_sq, jnp.inf))
        from ...core.medioid import compute_medioid
        self.entry_point = compute_medioid(masked)
        if self.status[self.entry_point] != SLOT_VALID:
            self.entry_point = int(alive[0])


@jax.jit
def _compact_kernel(adjacency: jax.Array, vectors: jax.Array,
                    norms_sq: jax.Array, perm: jax.Array, o2n: jax.Array,
                    n_alive: jax.Array):
    """Gather-remap the graph + dataset through a slot permutation on device
    (dynamic_index.h:791-884).  ``perm``: (capacity,) new->old slot ids
    (rows past ``n_alive`` arbitrary); ``o2n``: (capacity,) old->new, -1 for
    dropped slots.  ``n_alive`` is traced so compactions of different sizes
    share one executable."""
    cap = adjacency.shape[0]
    live = jnp.arange(cap, dtype=jnp.int32) < n_alive
    rows = jnp.take(adjacency, perm, axis=0, mode="clip")
    remapped = jnp.where(rows >= 0,
                         jnp.take(o2n, jnp.maximum(rows, 0), mode="clip"),
                         -1)
    # edges to dropped slots vanish; repack left (stable: order preserved)
    order = jnp.argsort(remapped < 0, axis=1, stable=True)
    remapped = jnp.take_along_axis(remapped, order, axis=1)
    remapped = jnp.where(live[:, None], remapped, -1)
    degrees = jnp.sum(remapped >= 0, axis=1).astype(jnp.int32)
    vecs = jnp.take(vectors, perm, axis=0, mode="clip")
    vecs = jnp.where(live[:, None], vecs, 0)
    norms = jnp.where(live, jnp.take(norms_sq, perm, mode="clip"), jnp.inf)
    return remapped, degrees, vecs, norms


@partial(jax.jit, static_argnames=("k",))
def _drop_deleted(keys: jax.Array, ids: jax.Array, deleted_mask: jax.Array,
                  k: int):
    """Poison deleted slots in the result beam, re-select top-k."""
    is_del = jnp.take(deleted_mask, jnp.maximum(ids, 0), mode="clip")
    keys = jnp.where(is_del | (ids < 0), jnp.inf, keys)
    return topk_ops.smallest_k(keys, ids, k)


@partial(jax.jit, static_argnames=(
    "k", "window", "capacity", "max_iters", "distance", "pop_width",
    "tail_frac", "visited_size", "n_entries"))
def _dyn_search_batch(graph, data, packed, deleted_mask, sampler, q,
                      q_scale, entry_ids, *, k: int, window: int,
                      capacity: int, max_iters: int, distance,
                      pop_width: int, tail_frac: int, visited_size: int,
                      n_entries: int = 1):
    """One fused serving dispatch for the dynamic index: (optional)
    per-query entry selection + beam search + deleted-slot drop +
    key->distance conversion on one equal-shape, asynchronously-uploaded
    query batch (mirrors index.py `_search_batch`; the predicated
    extraction is the reference's dynamic_search_buffer.h semantics)."""
    from .index import dequantize_queries
    q = dequantize_queries(q, q_scale)
    if sampler is not None:
        entry_ids = sampler.select(distance, q, n_entries=n_entries)
    out = search_mod.greedy_search(
        graph, data, q, entry_ids,
        window=window, capacity=capacity, max_iters=max_iters,
        distance=distance, pop_width=pop_width, packed=packed,
        tail_frac=tail_frac, visited_size=visited_size)
    keys, ids = _drop_deleted(out.keys, out.ids, deleted_mask, k)
    return ids, dist_ops.value_from_key(distance, keys)
