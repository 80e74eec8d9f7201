"""Sharded dynamic (mutable) Vamana: add / delete / consolidate / compact
over a device mesh.

The multi-chip composition of ``MutableVamanaIndex``
(``include/svs/index/vamana/dynamic_index.h:111``) with the NUMA-style row
partitioning (``include/svs/lib/numa.h:230``): graph rows and dataset rows
are block-sharded across a ``jax.sharding.Mesh`` axis, and every operation —
incremental build rounds, consolidation re-pruning, search, compaction —
runs the UNCHANGED single-chip kernels over the collective shard views
(:mod:`.sharded`).  This is the BASELINE.md "Deep-100M dynamic Vamana
sharded across a slice" configuration: per-device memory is
O(n / n_shards) while mutation results stay bit-identical to the
single-chip index given identical state and parameters (tested in
``tests/test_parallel.py``).

Design notes (TPU-first, not a translation):

* **Slot model**: capacity is fixed per epoch and divisible by the shard
  count; every slot belongs to exactly one device (block ownership).  The
  host keeps the Empty/Valid/Deleted status array and the id translator
  exactly like the single-chip index — O(capacity) host metadata is cheap;
  the O(capacity * (R + d)) payload stays sharded on device.
* **Mutations are SPMD**: add_points scatters new rows through a shard_map
  in which each device applies only the updates it owns, then runs the same
  fused build rounds as the single-chip ``_build_over`` with the graph/data
  arguments replaced by shard views.  XLA inserts the (B, K) key-panel
  collectives; adjacency row commits are local.
* **Compaction is LOCAL**: slots compact within their owning shard (per-
  shard dense prefixes) so no row ever crosses the interconnect — the
  sharded analog of the reference's in-place ``compact``
  (dynamic_index.h:791-884).  The old->new id remap is applied to adjacency
  with a replicated O(capacity) table.
* **Growth** doubles capacity and re-lays both structures out with
  ``device_put`` (device-to-device reshard; block ownership changes but ids
  are global so no content rewrite is needed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.graph import NeighborGraph
from ..core.data import VectorDataset
from ..core.query_result import QueryResult
from ..core.translation import IDTranslator
from ..lib import datatypes as dt
from ..ops import distance as dist_ops
from ..index.vamana import build as build_mod
from ..index.vamana import search as search_mod
from ..index.vamana.dynamic import (SLOT_DELETED, SLOT_EMPTY, SLOT_VALID,
                                    _drop_deleted, consolidate_round)
from ..index.vamana.params import (VamanaBuildParameters,
                                   VamanaSearchParameters)
from . import sharded


class ShardedMutableVamanaIndex:
    """Mutable Vamana with graph + dataset rows sharded across a mesh."""

    def __init__(self, parameters: VamanaBuildParameters, data, external_ids,
                 distance, mesh: Mesh, *, capacity: Optional[int] = None,
                 axis: str = "shard", query_batch_size: int = 2048):
        x = np.asarray(data, dtype=np.float32)
        n, dim = x.shape
        self.mesh = mesh
        self.axis = axis
        self.distance = dist_ops.as_distance(distance)
        self.parameters = parameters.resolved(self.distance)
        self.query_batch_size = query_batch_size
        self.dim = dim
        self.padded_dim = dt.padded_dim(dim)
        self._fns = {}            # compiled shard_map executables

        cap = self._round_capacity(capacity if capacity is not None
                                   else max(2 * n, 64))
        self.status = np.full(cap, SLOT_EMPTY, dtype=np.int8)
        self.status[:n] = SLOT_VALID
        self.translator = IDTranslator(cap)
        self.translator.insert(np.asarray(external_ids, dtype=np.int64),
                               np.arange(n, dtype=np.int64))
        self._search_parameters = VamanaSearchParameters()
        self._sampler_cfg = None     # per-query entries (enable_entry_sampler)
        self._entry_sampler = None

        # lay the dataset out sharded at blocked capacity
        host = np.zeros((cap, self.padded_dim), dtype=np.float32)
        host[:n, :dim] = x
        norms = np.full(cap, np.inf, dtype=np.float32)
        norms[:n] = (x.astype(np.float32) ** 2).sum(axis=1)
        row_sh = NamedSharding(mesh, P(axis, None))
        vec_sh = NamedSharding(mesh, P(axis))
        self.vectors = jax.device_put(jnp.asarray(host), row_sh)
        self.norms_sq = jax.device_put(jnp.asarray(norms), vec_sh)
        self.deleted_mask = jax.device_put(
            jnp.zeros((cap,), dtype=bool), NamedSharding(mesh, P()))

        r = self.parameters.graph_max_degree
        g0 = NeighborGraph.empty(cap, r)
        self.adjacency = jax.device_put(g0.adjacency, row_sh)
        self.degrees = jax.device_put(g0.degrees, vec_sh)

        self.entry_point = self._sharded_medioid()
        # initial construction: the same two-pass schedule as the static
        # builder (rev_alpha 1.0 then alpha), each round over shard views
        slots = np.arange(n, dtype=np.int64)
        for rev_alpha in (1.0, float(self.parameters.alpha)):
            self._build_over(slots, rev_alpha=rev_alpha)

    # -- layout helpers -------------------------------------------------------
    @property
    def n_shards(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def capacity(self) -> int:
        return self.status.size

    @property
    def rows_per_shard(self) -> int:
        return self.capacity // self.n_shards

    def _round_capacity(self, want: int) -> int:
        """Blocked capacity: per-shard row count padded to 8."""
        per = dt.pad_to(-(-max(want, 8) // self.n_shards), 8)
        return per * self.n_shards

    def _views_meta(self):
        g_meta = dict(axis=self.axis, n=self.capacity,
                      max_degree=self.parameters.graph_max_degree,
                      global_capacity=self.capacity)
        d_meta = dict(axis=self.axis, n=self.capacity, dim=self.dim)
        return g_meta, d_meta

    def _fn(self, key, builder):
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = builder()
        return fn

    # -- properties -----------------------------------------------------------
    @property
    def size(self) -> int:
        return int((self.status == SLOT_VALID).sum())

    @property
    def dimensions(self) -> int:
        return self.dim

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

    # -- per-query entry selection ---------------------------------------------
    def enable_entry_sampler(self, n_samples: Optional[int] = None,
                             n_entries: int = 1, seed: int = 0) -> None:
        """Per-query entries from a replicated sample of the LIVE slots
        (entry.py; ``None`` auto-scales with the live count at each
        rebuild).  The sample is small, so it is gathered once from the
        sharded rows and replicated; every mutation invalidates it (slot
        reuse repoints ids) and it is rebuilt lazily on the next search."""
        self._sampler_cfg = (n_samples, n_entries, seed)
        self._entry_sampler = None

    def disable_entry_sampler(self) -> None:
        self._sampler_cfg = None
        self._entry_sampler = None

    def _ensure_sampler(self):
        cfg = self._sampler_cfg
        if cfg is None:
            return None, 1
        if self._entry_sampler is None:
            from ..index.vamana.entry import EntrySampler, auto_samples
            n_samples, _n_entries, seed = cfg
            alive = np.nonzero(self.status == SLOT_VALID)[0]
            if n_samples is None:
                n_samples = auto_samples(alive.size)
            rng = np.random.default_rng(seed)
            size = min(n_samples, alive.size)
            ids = rng.choice(alive, size=size, replace=False).astype(
                np.int32) if size else np.asarray([self.entry_point],
                                                  dtype=np.int32)
            rep = NamedSharding(self.mesh, P())
            dev_ids = jax.device_put(jnp.asarray(ids), rep)
            vecs, nrms = jax.jit(lambda v, n, i: (v[i], n[i]))(
                self.vectors, self.norms_sq, dev_ids)
            self._entry_sampler = EntrySampler(
                vectors=jax.device_put(vecs, rep),
                norms_sq=jax.device_put(nrms, rep), ids=dev_ids)
        return self._entry_sampler, cfg[1]

    def _invalidate_sampler(self) -> None:
        self._entry_sampler = None

    def all_ids(self) -> np.ndarray:
        return np.sort(self.translator.all_external_ids())

    def has_id(self, external_id: int) -> bool:
        return external_id in self.translator

    # -- shard_map builders ---------------------------------------------------
    def _sharded_medioid(self) -> int:
        """Entry point = row closest to the alive-mean (core/medioid.py),
        computed without gathering rows: psum of local partial sums, local
        argmin, all_gather of the per-shard best."""
        axis = self.axis
        alive = jnp.asarray(self.status == SLOT_VALID)

        def builder():
            def local(vec, nrm, alive_rep):
                idx = jax.lax.axis_index(axis)
                rps = vec.shape[0]
                mine = jax.lax.dynamic_slice_in_dim(
                    alive_rep, idx * rps, rps)
                cnt = jax.lax.psum(jnp.sum(mine), axis)
                total = jax.lax.psum(
                    jnp.sum(jnp.where(mine[:, None], vec, 0.0), axis=0),
                    axis)
                mean = total / jnp.maximum(cnt, 1).astype(jnp.float32)
                d2 = jnp.sum((vec - mean[None, :]) ** 2, axis=1)
                d2 = jnp.where(mine, d2, jnp.inf)
                best_local = jnp.argmin(d2)
                # keep the id lane integral: a float32 lane rounds global
                # slot ids above 2^24 (Deep-100M scale) to a nearby — and
                # possibly empty — slot
                all_d2 = jax.lax.all_gather(d2[best_local], axis)   # (S,)
                all_id = jax.lax.all_gather(
                    (best_local + idx * rps).astype(jnp.int32), axis)
                win = jnp.argmin(all_d2)
                return all_id[win]

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P()),
                out_specs=P(), check_vma=False))

        fn = self._fn(("medioid", self.capacity), builder)
        return int(np.asarray(fn(self.vectors, self.norms_sq, alive)))

    def _build_over(self, slots: np.ndarray, rev_alpha: float = None,
                    batch_size: Optional[int] = None) -> None:
        """Incremental construction over specific slots — the sharded analog
        of ``MutableVamanaIndex._build_over``: same fused rounds, graph/data
        replaced by shard views (dynamic_index.h:630-723)."""
        p = self.parameters
        n_slots = slots.size
        if n_slots == 0:
            return
        if rev_alpha is None:
            rev_alpha = float(p.alpha)
        b = batch_size or build_mod.default_batch_size(max(n_slots, 1))
        b = min(b, dt.pad_to(n_slots, 8))
        axis = self.axis
        window = p.window_size
        max_iters = search_mod.default_max_iters(window)
        g_meta, d_meta = self._views_meta()

        def builder():
            def local(adj, deg, vec, nrm, ids, valid, eids):
                gview = sharded.ShardedGraphShard(adj, deg, **g_meta)
                dview = sharded.ShardedDataShard(vec, nrm, **d_meta)
                g2, _ = build_mod.build_round(
                    gview, dview, ids, valid, eids,
                    window=window, capacity=window, max_iters=max_iters,
                    distance=self.distance,
                    pool_size=p.max_candidate_pool_size,
                    gen_alpha=float(p.alpha), rev_alpha=rev_alpha,
                    prune_to=p.prune_to, max_degree=p.graph_max_degree,
                    prune_chunk=128, pop_width=4, tail_frac=4)
                return g2.adjacency, g2.degrees

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P(), P()),
                out_specs=(P(axis, None), P(axis)), check_vma=False))

        fn = self._fn(("round", self.capacity, b, window, rev_alpha),
                      builder)
        entry_ids = jnp.asarray([self.entry_point], dtype=jnp.int32)
        for start in range(0, n_slots, b):
            chunk = slots[start: start + b]
            ids = np.full(b, chunk[0], dtype=np.int32)
            ids[: chunk.size] = chunk
            valid = np.zeros(b, dtype=bool)
            valid[: chunk.size] = True
            self.adjacency, self.degrees = fn(
                self.adjacency, self.degrees, self.vectors, self.norms_sq,
                jnp.asarray(ids), jnp.asarray(valid), entry_ids)

    # -- search ---------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[VamanaSearchParameters] = None,
               cancel=None) -> QueryResult:
        """Sharded greedy search + deleted-slot drop + id translation
        (mirrors ``MutableVamanaIndex.search``; the beam state stays
        replicated so results are bit-identical to single-chip)."""
        from ..lib.exceptions import check_cancel
        check_cancel(cancel)
        params = parameters or self._search_parameters
        cfg = params.buffer_config
        window = max(cfg.search_window_size, k)
        capacity = max(cfg.search_buffer_capacity, window, 2 * k)
        max_iters = params.resolved_max_iters()

        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self.dim:
            raise ValueError(f"query dim {dim} != dataset dim {self.dim}")
        rows = dt.pad_to(nq, 8)
        from ..index.vamana.index import (dequantize_queries,
                                          prepare_query_upload)
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=rows, d_pad=self.padded_dim)
        # same upload rounding as the single-chip index so results stay
        # bit-identical across the two paths (parity tests rely on it);
        # int8 uploads dequantize here with the same convert+multiply the
        # single-chip fused dispatch applies
        q_up, q_scale = prepare_query_upload(
            q_host, getattr(self, "query_upload_dtype", None))
        q = dequantize_queries(
            jnp.asarray(q_up),
            None if q_scale is None else jnp.asarray(q_scale))
        axis = self.axis
        g_meta, d_meta = self._views_meta()

        sampler, n_entries = self._ensure_sampler()
        s_arrays = () if sampler is None else (
            sampler.vectors, sampler.norms_sq, sampler.ids)
        s_specs = () if sampler is None else (P(), P(), P())

        def builder():
            def local(adj, deg, vec, nrm, q, eids, deleted, *s_rest):
                q = q.astype(jnp.float32)   # pre-greedy cast, as single-chip
                gview = sharded.ShardedGraphShard(adj, deg, **g_meta)
                dview = sharded.ShardedDataShard(vec, nrm, **d_meta)
                if s_rest:
                    from ..index.vamana.entry import EntrySampler
                    eids = EntrySampler(*s_rest).select(
                        self.distance, q, n_entries=n_entries)
                out = search_mod.greedy_search(
                    gview, dview, q, eids, window=window, capacity=capacity,
                    max_iters=max_iters, distance=self.distance)
                keys, ids = _drop_deleted(out.keys, out.ids, deleted, k)
                return ids, dist_ops.value_from_key(self.distance, keys)

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P(), P(), *s_specs),
                out_specs=(P(), P()), check_vma=False))

        fn = self._fn(("search", self.capacity, rows, k, window, capacity,
                       max_iters, sampler is not None,
                       None if sampler is None else
                       tuple(sampler.ids.shape) + (n_entries,)), builder)
        entry_ids = jnp.asarray([self.entry_point], dtype=jnp.int32)
        ids, vals = fn(self.adjacency, self.degrees, self.vectors,
                       self.norms_sq, q, entry_ids, self.deleted_mask,
                       *s_arrays)
        slots = np.asarray(ids)[:nq]
        out_ids = np.where(slots >= 0, self.translator.to_external(slots),
                           -1)
        return QueryResult(ids=out_ids,
                           distances=np.asarray(vals)[:nq])

    # -- mutation -------------------------------------------------------------
    def add_points(self, points, external_ids) -> np.ndarray:
        """Insert vectors under new external ids; returns assigned slots.
        Scatter is SPMD (each device applies the updates it owns), then the
        same incremental rounds as single-chip add (dynamic_index.h:630)."""
        points = np.asarray(points, dtype=np.float32)
        external_ids = np.asarray(external_ids, dtype=np.int64)
        if points.shape[0] != external_ids.size:
            raise ValueError("points / external_ids length mismatch")
        m = points.shape[0]
        empty = np.nonzero(self.status == SLOT_EMPTY)[0]
        if empty.size < m:
            self._grow(self._round_capacity(
                max(2 * self.capacity, self.capacity + m)))
            empty = np.nonzero(self.status == SLOT_EMPTY)[0]
        slots = empty[:m].astype(np.int64)

        self.translator.insert(external_ids, slots)
        b = dt.pad_to(m, 8)
        slot_arr = np.full(b, self.capacity, dtype=np.int32)  # OOB = dropped
        slot_arr[:m] = slots
        rows = dt.pad_matrix(points, n_pad=b, d_pad=self.padded_dim)
        row_norms = np.zeros(b, dtype=np.float32)
        row_norms[:m] = (points.astype(np.float32) ** 2).sum(axis=1)

        axis = self.axis
        r = self.parameters.graph_max_degree

        def builder():
            def local(adj, deg, vec, nrm, deleted, sl, rws, rn):
                idx = jax.lax.axis_index(axis)
                rps = vec.shape[0]
                lid = sl - idx * rps
                mine = (lid >= 0) & (lid < rps) & (sl < self.capacity)
                li = jnp.where(mine, lid, rps)
                vec = vec.at[li].set(rws, mode="drop")
                nrm = nrm.at[li].set(rn, mode="drop")
                adj = adj.at[li].set(
                    jnp.full((sl.shape[0], r), -1, jnp.int32), mode="drop")
                deg = deg.at[li].set(0, mode="drop")
                deleted = deleted.at[jnp.where(sl < self.capacity, sl,
                                               self.capacity)].set(
                    False, mode="drop")
                return adj, deg, vec, nrm, deleted

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P(), P(), P()),
                out_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                           P()), check_vma=False))

        fn = self._fn(("scatter", self.capacity, b), builder)
        (self.adjacency, self.degrees, self.vectors, self.norms_sq,
         self.deleted_mask) = fn(
            self.adjacency, self.degrees, self.vectors, self.norms_sq,
            self.deleted_mask, jnp.asarray(slot_arr), jnp.asarray(rows),
            jnp.asarray(row_norms))
        self.status[slots] = SLOT_VALID
        self._invalidate_sampler()
        self._build_over(slots)
        return slots

    def delete_points(self, external_ids) -> None:
        """Soft delete (dynamic_index.h:747-760)."""
        slots = self.translator.remove(external_ids)
        self.status[slots] = SLOT_DELETED
        self.deleted_mask = self.deleted_mask.at[jnp.asarray(slots)].set(
            True)
        self._invalidate_sampler()
        if self.status[self.entry_point] != SLOT_VALID:
            self.entry_point = self._sharded_medioid()

    def consolidate(self, batch_size: int = 1024) -> None:
        """Re-prune vertices adjacent to deleted nodes over shard views
        (consolidate.h:139-310); the affected scan is SPMD over the local
        adjacency blocks — only the (capacity,) bool mask is gathered."""
        deleted = np.nonzero(self.status == SLOT_DELETED)[0]
        if deleted.size == 0:
            return
        self._invalidate_sampler()
        axis = self.axis
        valid_mask = jnp.asarray(self.status == SLOT_VALID)
        g_meta, d_meta = self._views_meta()
        r = self.parameters.graph_max_degree

        def aff_builder():
            def local(adj, deleted_rep, valid_rep):
                idx = jax.lax.axis_index(axis)
                rps = adj.shape[0]
                mine_valid = jax.lax.dynamic_slice_in_dim(
                    valid_rep, idx * rps, rps)
                neigh_del = (jnp.take(deleted_rep, jnp.maximum(adj, 0),
                                      mode="clip") & (adj >= 0))
                return neigh_del.any(axis=1) & mine_valid

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(), P()),
                out_specs=P(axis), check_vma=False))

        aff = self._fn(("affected", self.capacity), aff_builder)
        affected = np.nonzero(np.asarray(
            aff(self.adjacency, self.deleted_mask, valid_mask)))[0]

        pool_cap = min(r * (r + 1), 4 * r)

        def round_builder():
            def local(adj, deg, vec, nrm, ids, valid, deleted):
                gview = sharded.ShardedGraphShard(adj, deg, **g_meta)
                dview = sharded.ShardedDataShard(vec, nrm, **d_meta)
                g2 = consolidate_round(
                    gview, dview, ids, valid, deleted,
                    prune_to=self.parameters.prune_to,
                    alpha=float(self.parameters.alpha),
                    distance=self.distance, max_degree=r, prune_chunk=128,
                    pool_cap=pool_cap)
                return g2.adjacency, g2.degrees

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P(), P()),
                out_specs=(P(axis, None), P(axis)), check_vma=False))

        fn = self._fn(("consolidate", self.capacity, batch_size),
                      round_builder)
        for start in range(0, affected.size, batch_size):
            chunk = affected[start: start + batch_size]
            ids = np.zeros(batch_size, dtype=np.int32)
            ids[: chunk.size] = chunk
            valid = np.zeros(batch_size, dtype=bool)
            valid[: chunk.size] = True
            self.adjacency, self.degrees = fn(
                self.adjacency, self.degrees, self.vectors, self.norms_sq,
                jnp.asarray(ids), jnp.asarray(valid), self.deleted_mask)

        # clear + free the deleted slots (SPMD row clear)
        self._clear_rows(deleted)
        self.status[deleted] = SLOT_EMPTY
        self.deleted_mask = self.deleted_mask.at[
            jnp.asarray(deleted)].set(False)

    def _clear_rows(self, slots: np.ndarray) -> None:
        b = dt.pad_to(max(slots.size, 1), 8)
        arr = np.full(b, self.capacity, dtype=np.int32)
        arr[: slots.size] = slots
        axis = self.axis
        r = self.parameters.graph_max_degree

        def builder():
            def local(adj, deg, sl):
                idx = jax.lax.axis_index(axis)
                rps = adj.shape[0]
                lid = sl - idx * rps
                mine = (lid >= 0) & (lid < rps) & (sl < self.capacity)
                li = jnp.where(mine, lid, rps)
                adj = adj.at[li].set(
                    jnp.full((sl.shape[0], r), -1, jnp.int32), mode="drop")
                deg = deg.at[li].set(0, mode="drop")
                return adj, deg

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P()),
                out_specs=(P(axis, None), P(axis)), check_vma=False))

        fn = self._fn(("clear", self.capacity, b), builder)
        self.adjacency, self.degrees = fn(self.adjacency, self.degrees,
                                          jnp.asarray(arr))

    def compact(self) -> None:
        """Per-shard dense compaction: every slot moves only WITHIN its
        owning shard (no interconnect traffic), producing per-shard dense
        prefixes; adjacency ids are remapped through a replicated
        old->new table (the sharded formulation of
        dynamic_index.h:791-884)."""
        cap, rps, s = self.capacity, self.rows_per_shard, self.n_shards
        occupied = self.status != SLOT_EMPTY
        if not occupied.any() or occupied.all():
            return
        self._invalidate_sampler()
        old_to_new = np.full(cap, -1, dtype=np.int32)
        perm = np.arange(cap, dtype=np.int32)       # new slot -> old slot
        new_status = np.full(cap, SLOT_EMPTY, dtype=np.int8)
        for sh in range(s):
            lo = sh * rps
            alive = lo + np.nonzero(occupied[lo: lo + rps])[0]
            old_to_new[alive] = lo + np.arange(alive.size)
            perm[lo: lo + alive.size] = alive
            new_status[lo: lo + alive.size] = self.status[alive]

        axis = self.axis

        def builder():
            def local(adj, deg, vec, nrm, perm_rep, o2n_rep):
                idx = jax.lax.axis_index(axis)
                lperm = jax.lax.dynamic_slice_in_dim(
                    perm_rep, idx * rps, rps) - idx * rps   # local source
                rows = jnp.take(adj, lperm, axis=0)
                remapped = jnp.where(
                    rows >= 0,
                    jnp.take(o2n_rep, jnp.maximum(rows, 0), mode="clip"),
                    -1)
                order = jnp.argsort(remapped < 0, axis=1, stable=True)
                remapped = jnp.take_along_axis(remapped, order, axis=1)
                degrees = jnp.sum(remapped >= 0, axis=1).astype(jnp.int32)
                return (remapped, degrees,
                        jnp.take(vec, lperm, axis=0),
                        jnp.take(nrm, lperm))

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis, None), P(axis), P(axis, None), P(axis),
                          P(), P()),
                out_specs=(P(axis, None), P(axis), P(axis, None), P(axis)),
                check_vma=False))

        fn = self._fn(("compact", cap), builder)
        self.adjacency, self.degrees, self.vectors, self.norms_sq = fn(
            self.adjacency, self.degrees, self.vectors, self.norms_sq,
            jnp.asarray(perm), jnp.asarray(old_to_new))
        # poison norms of now-empty slots + clear their adjacency
        freed = np.nonzero((new_status == SLOT_EMPTY) & occupied)[0]
        self.status = new_status
        self._clear_rows(freed)
        self._poison_norms(np.nonzero(new_status == SLOT_EMPTY)[0])
        self.deleted_mask = jnp.asarray(new_status == SLOT_DELETED)
        remap64 = np.full(cap + 1, -1, dtype=np.int64)
        remap64[:cap] = old_to_new
        self.translator.remap(remap64)
        # match single-chip compact(): ALWAYS recompute the medioid
        # (dynamic.py:427 -> _reset_entry_point).  The previous check read
        # the NEW status array at the OLD entry slot — i.e. whatever point
        # happens to occupy that slot after the permutation — so the two
        # implementations could diverge after compaction.
        self.entry_point = self._sharded_medioid()

    def _poison_norms(self, slots: np.ndarray) -> None:
        if slots.size == 0:
            return
        b = dt.pad_to(slots.size, 8)
        arr = np.full(b, self.capacity, dtype=np.int32)
        arr[: slots.size] = slots
        axis = self.axis

        def builder():
            def local(nrm, sl):
                idx = jax.lax.axis_index(axis)
                rps = nrm.shape[0]
                lid = sl - idx * rps
                mine = (lid >= 0) & (lid < rps) & (sl < self.capacity)
                li = jnp.where(mine, lid, rps)
                return nrm.at[li].set(jnp.inf, mode="drop")

            return jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis), P()), out_specs=P(axis),
                check_vma=False))

        fn = self._fn(("poison", self.capacity, b), builder)
        self.norms_sq = fn(self.norms_sq, jnp.asarray(arr))

    def _grow(self, new_cap: int) -> None:
        """Double capacity: pad on host order, re-lay out sharded.  Ids are
        global so adjacency content survives the ownership change."""
        cap = self.capacity
        g = new_cap - cap
        if g <= 0:
            return
        self._invalidate_sampler()
        row_sh = NamedSharding(self.mesh, P(self.axis, None))
        vec_sh = NamedSharding(self.mesh, P(self.axis))
        self.adjacency = jax.device_put(
            jnp.pad(self.adjacency, ((0, g), (0, 0)), constant_values=-1),
            row_sh)
        self.degrees = jax.device_put(jnp.pad(self.degrees, (0, g)), vec_sh)
        self.vectors = jax.device_put(
            jnp.pad(self.vectors, ((0, g), (0, 0))), row_sh)
        self.norms_sq = jax.device_put(
            jnp.pad(self.norms_sq, (0, g), constant_values=jnp.inf), vec_sh)
        self.deleted_mask = jax.device_put(
            jnp.pad(self.deleted_mask, (0, g)),
            NamedSharding(self.mesh, P()))
        self.status = np.pad(self.status, (0, g))
        self._fns.clear()          # capacity is a static arg everywhere

    # -- interop --------------------------------------------------------------
    @classmethod
    def from_single_chip(cls, index, mesh: Mesh, *, axis: str = "shard"
                         ) -> "ShardedMutableVamanaIndex":
        """Re-shard a single-chip ``MutableVamanaIndex`` across a mesh
        (state-preserving: subsequent mutations are bit-identical to the
        single-chip index given the same calls)."""
        if not isinstance(index.data, VectorDataset):
            raise ValueError("from_single_chip requires an f32/bf16 "
                             "VectorDataset-backed index")
        obj = cls.__new__(cls)
        obj.mesh = mesh
        obj.axis = axis
        obj.distance = index.distance
        obj.parameters = index.parameters
        obj.query_batch_size = index.query_batch_size
        obj.dim = index.data.dim
        obj.padded_dim = index.data.padded_dim
        obj._fns = {}
        n_shards = mesh.shape[axis]
        cap0 = index.data.capacity
        per = dt.pad_to(-(-cap0 // n_shards), 8)
        cap = per * n_shards
        graph = index.graph.with_capacity(cap)
        data = index.data.with_capacity(cap)
        # with_capacity may round up past cap (32-alignment)
        cap = max(cap, data.capacity, graph.capacity)
        if cap % n_shards:
            raise ValueError(f"capacity {cap} not shardable {n_shards}-way")
        graph = graph.with_capacity(cap)
        data = data.with_capacity(cap)
        row_sh = NamedSharding(mesh, P(axis, None))
        vec_sh = NamedSharding(mesh, P(axis))
        obj.adjacency = jax.device_put(graph.adjacency, row_sh)
        obj.degrees = jax.device_put(graph.degrees, vec_sh)
        obj.vectors = jax.device_put(data.vectors, row_sh)
        obj.norms_sq = jax.device_put(data.norms_sq, vec_sh)
        dm = np.zeros(cap, dtype=bool)
        dm[: index.deleted_mask.shape[0]] = np.asarray(index.deleted_mask)
        obj.deleted_mask = jax.device_put(jnp.asarray(dm),
                                          NamedSharding(mesh, P()))
        obj.status = np.full(cap, SLOT_EMPTY, dtype=np.int8)
        obj.status[: index.status.size] = index.status
        obj.translator = index.translator.copy()
        obj.entry_point = index.entry_point
        obj._search_parameters = index.search_parameters
        obj._sampler_cfg = getattr(index, "_sampler_cfg", None)
        obj._entry_sampler = None
        return obj

    def to_single_chip(self):
        """Gather the sharded state back into a single-chip
        ``MutableVamanaIndex`` (for persistence — the save format is the
        single-chip one, like the reference saving a NUMA-partitioned
        index as one checkpoint)."""
        from ..index.vamana.dynamic import MutableVamanaIndex
        cap = self.capacity
        obj = MutableVamanaIndex.__new__(MutableVamanaIndex)
        obj.distance = self.distance
        obj.parameters = self.parameters
        import scalablevectorsearch_tpu.lib.logging as svs_logging
        obj.logger = svs_logging.as_logger(None)
        obj.query_batch_size = self.query_batch_size
        obj.pop_width = 4
        obj.data = VectorDataset(
            vectors=jnp.asarray(np.asarray(self.vectors)),
            norms_sq=jnp.asarray(np.asarray(self.norms_sq)),
            n=cap, dim=self.dim)
        obj.graph = NeighborGraph(
            adjacency=jnp.asarray(np.asarray(self.adjacency)),
            degrees=jnp.asarray(np.asarray(self.degrees)),
            n=cap, max_degree=self.parameters.graph_max_degree)
        obj.status = self.status.copy()
        obj.deleted_mask = jnp.asarray(self.status == SLOT_DELETED)
        obj.translator = self.translator.copy()
        obj.entry_point = self.entry_point
        obj._search_parameters = self._search_parameters
        obj._packed = None
        obj._packed_dtype = None
        obj.tail_frac = 4
        return obj
