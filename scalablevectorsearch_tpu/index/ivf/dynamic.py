"""Dynamic (mutable) IVF index.

TPU-native analog of the reference's ``DynamicIVFIndex``
(``include/svs/index/ivf/dynamic_ivf.h``): fixed centroids from the initial
clustering, mutable posting lists, external-id translation.

The uniform padded-cluster layout makes mutation cheap and device-friendly:

* **add**: one centroid matmul assigns each new point; free slots are
  claimed by a fully vectorized sort-by-cluster + segment-rank mapping
  (no per-point host loops — the same trick as the Vamana build's
  reverse-edge pass);
* **per-cluster growth**: when a cluster runs out of free slots it gains
  additional *probe units* — fixed-``slot``-row blocks appended to the
  layout whose centroid rows replicate the owning cluster's centroid
  (the dynamic analog of the static index's chunked postings, and the
  TPU answer to the reference's per-cluster blocked resize,
  dynamic_ivf.h:889-996).  Only the overflowing cluster pays; the rest of
  the layout is untouched and ``slot`` stays static for the scan kernel;
* **delete**: a slot becomes padding again (id -> -1, norm -> +inf) — the
  scan kernel's masking makes deletion free at search time;
* **compact**: repack clusters densely to the minimal aligned slot
  (collapses multi-unit clusters back to one unit each).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ...core.data import VectorDataset
from ...core.query_result import QueryResult
from ...core.translation import IDTranslator
from ...lib import datatypes as dt
from ...ops import distance as dist_ops
from .clustering import Clustering
from .index import _ivf_serve_batch
from .kmeans import assign_full
from .params import IVFBuildParameters, IVFSearchParameters


class DynamicIVFIndex:
    def __init__(self, clustering: Clustering, data, external_ids, distance,
                 *, slot_slack: float = 1.5, query_batch_size: int = 2048,
                 scan_subtile: int = 256, logger=None):
        x = np.asarray(data, dtype=np.float32)
        external_ids = np.asarray(external_ids, dtype=np.int64)
        self.distance = dist_ops.as_distance(distance)
        self.k = clustering.num_centroids
        self.query_batch_size = query_batch_size
        self.scan_subtile = scan_subtile
        self._d = x.shape[1]

        centroids = np.asarray(clustering.centroids, dtype=np.float32)
        d_pad = dt.padded_dim(self._d)
        if centroids.shape[1] < d_pad:
            centroids = np.pad(centroids,
                               ((0, 0), (0, d_pad - centroids.shape[1])))
        self._base_centroids = centroids      # (k, d_pad) logical centroids

        assign = np.asarray(clustering.assignments)
        sizes = np.bincount(assign, minlength=self.k)
        slot = int(dt.pad_to(max(int(sizes.max() * slot_slack), 8), 8))
        self._init_layout(x, external_ids, assign, slot)

    # -- layout --------------------------------------------------------------
    def _init_layout(self, x, external_ids, assign, slot: int):
        """(Re)pack points into a padded layout with the given slot size,
        one probe unit per logical cluster."""
        k = self.k
        self.slot = slot
        self.unit_owner = np.arange(k, dtype=np.int32)  # unit -> cluster
        total = k * slot
        order = np.argsort(assign, kind="stable")
        sizes = np.bincount(assign, minlength=k)
        if sizes.max() > slot:
            raise ValueError("slot too small for cluster sizes")
        starts = np.zeros(k, dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        rank = np.arange(x.shape[0]) - starts[assign[order]]
        pos = assign[order].astype(np.int64) * slot + rank

        rows = np.zeros((total, x.shape[1]), dtype=np.float32)
        rows[pos] = x[order]
        self.data = VectorDataset.from_array(rows, capacity=total)
        # padding = +inf norms so the scan can never return it
        occupied = np.zeros(total, dtype=bool)
        occupied[pos] = True
        self.data = dataclasses.replace(
            self.data, norms_sq=jnp.where(jnp.asarray(occupied),
                                          self.data.norms_sq, jnp.inf))
        self._fill = sizes.astype(np.int64)          # per-UNIT live count
        self._occupied = occupied                    # host mirror
        self.translator = IDTranslator(total)
        self.translator.insert(external_ids[order], pos)
        # the scan returns slot positions; external translation happens at
        # the API boundary through the translator
        ids_padded = np.full(total, -1, dtype=np.int32)
        ids_padded[pos] = pos.astype(np.int32)
        self.ids_padded = jnp.asarray(ids_padded)
        self._upload_unit_centroids()

    def _upload_unit_centroids(self) -> None:
        """(Re)build the per-probe-unit centroid rows on device."""
        units = self._base_centroids[self.unit_owner]
        self.centroids = jnp.asarray(units)
        self.centroid_norms = jnp.sum(self.centroids ** 2, axis=-1)

    def _add_units(self, per_cluster: np.ndarray) -> None:
        """Append ``per_cluster[c]`` empty probe units for each cluster c —
        per-cluster growth: only overflowing clusters pay, no repack."""
        new_owners = np.repeat(np.arange(self.k, dtype=np.int32),
                               per_cluster)
        if new_owners.size == 0:
            return
        self.unit_owner = np.concatenate([self.unit_owner, new_owners])
        grow = new_owners.size * self.slot
        total = self.unit_owner.size * self.slot
        self.data = self.data.with_capacity(total)
        self.ids_padded = jnp.pad(self.ids_padded,
                                  (0, total - self.ids_padded.shape[0]),
                                  constant_values=-1)
        self._occupied = np.concatenate(
            [self._occupied, np.zeros(grow, dtype=bool)])
        self._fill = np.concatenate(
            [self._fill, np.zeros(new_owners.size, dtype=np.int64)])
        self._upload_unit_centroids()

    # -- properties --------------------------------------------------------------
    @property
    def size(self) -> int:
        return len(self.translator)

    @property
    def dimensions(self) -> int:
        return self._d

    @property
    def num_centroids(self) -> int:
        """Logical cluster count (fixed at construction)."""
        return self.k

    @property
    def num_probe_units(self) -> int:
        """Probe units = centroid rows; grows past ``num_centroids`` when
        clusters overflow (n_probes counts these, like the static chunked
        layout)."""
        return self.unit_owner.size

    def all_ids(self) -> np.ndarray:
        return np.sort(self.translator.all_external_ids())

    def has_id(self, external_id: int) -> bool:
        return external_id in self.translator

    # -- search --------------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[IVFSearchParameters] = None,
               cancel=None) -> QueryResult:
        """``cancel``: optional zero-arg predicate checked between query
        batch dispatches (reference cancel hooks,
        tests/integration/cancel.cpp)."""
        return self.search_async(queries, k, parameters=parameters,
                                 cancel=cancel).result()

    def search_async(self, queries, k: int,
                     parameters: Optional[IVFSearchParameters] = None,
                     cancel=None):
        """Pipelined dispatch (see ``IVFIndex.search_async``); slot->external
        id translation happens on the host at ``.result()`` time."""
        from ..vamana.index import (PendingSearch, _BatchPlan,
                                    prepare_query_upload)
        from ...lib.exceptions import check_cancel
        params = parameters or IVFSearchParameters()
        n_probes = min(params.n_probes, self.num_probe_units)
        keep = max(k * params.k_reorder, k)
        from .index import _pick_subtile, _resolve_tiles_per_step
        sub = _pick_subtile(self.slot, self.scan_subtile)
        tiles = _resolve_tiles_per_step(
            getattr(self, "scan_tiles_per_step", 0), self.slot // sub)
        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self._d:
            raise ValueError(f"query dim {dim} != dataset dim {self._d}")
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_vals = np.empty((nq, k), dtype=np.float32)
        # fused per-batch dispatch + half-width uploads + async device->host
        # copies — the same serving pipeline as IVFIndex.search_async
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
            slots, vals = _ivf_serve_batch(
                self.centroids, self.centroid_norms, self.data,
                self.ids_padded, None, q_i, scale_i, k=k, n_probes=n_probes,
                keep=keep, slot=self.slot, sub=sub, distance=self.distance,
                rerank=False, tiles_per_step=tiles)
            pending.append((i * plan.rows, slots, vals))
        for _start, slots, vals in pending:
            slots.copy_to_host_async()
            vals.copy_to_host_async()

        def _translate(s):
            return np.where(
                s >= 0, self.translator.to_external(np.maximum(s, 0)), -1)

        return PendingSearch(pending=pending, rows=plan.rows, nq=nq,
                             out_ids=out_ids, out_vals=out_vals,
                             translate_ids=_translate)

    # -- mutation -----------------------------------------------------------------
    def add_points(self, points, external_ids) -> None:
        """Bulk insert — fully vectorized (no per-point host work).

        Free slots are claimed by sorting both the new points and the free
        list by owning cluster and aligning them with segment ranks — the
        same sort + segment-rank formulation as the Vamana build's
        reverse-edge pass.  Clusters without enough free slots first gain
        whole probe units (:meth:`_add_units`); the reference instead grows
        per-cluster blocked arrays (dynamic_ivf.h:889-996)."""
        points = np.asarray(points, dtype=np.float32)
        external_ids = np.asarray(external_ids, dtype=np.int64)
        assign = assign_full(points,
                             self._base_centroids[:, : self._d]).astype(
                                 np.int64)
        need = np.bincount(assign, minlength=self.k)
        free_mask = ~self._occupied
        owners_all = np.repeat(self.unit_owner.astype(np.int64), self.slot)
        free_per_cluster = np.bincount(owners_all[free_mask],
                                       minlength=self.k)
        deficit = need - free_per_cluster
        if np.any(deficit > 0):
            self._add_units(np.ceil(np.maximum(deficit, 0)
                                    / self.slot).astype(np.int64))
            free_mask = ~self._occupied
            owners_all = np.repeat(self.unit_owner.astype(np.int64),
                                   self.slot)

        # free slots grouped by owning cluster (stable: position order kept)
        free = np.flatnonzero(free_mask)
        owners = owners_all[free]
        by_owner = np.argsort(owners, kind="stable")
        free, owners = free[by_owner], owners[by_owner]

        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        rank = np.arange(sa.size) - np.searchsorted(sa, sa)
        slots_sorted = free[np.searchsorted(owners, sa) + rank]
        slots = np.empty(sa.size, dtype=np.int64)
        slots[order] = slots_sorted

        self._occupied[slots] = True
        self._fill += np.bincount(slots // self.slot,
                                  minlength=self._fill.size)
        self.translator.insert(external_ids, slots)
        rows = jnp.asarray(dt.pad_matrix(points, n_pad=points.shape[0],
                                         d_pad=self.data.padded_dim))
        self.data = self.data.scatter_rows(jnp.asarray(slots), rows)
        self.ids_padded = self.ids_padded.at[jnp.asarray(slots)].set(
            jnp.asarray(slots, dtype=jnp.int32))

    def delete_points(self, external_ids) -> None:
        slots = self.translator.remove(external_ids)
        self._occupied[slots] = False
        self._fill -= np.bincount(slots // self.slot,
                                  minlength=self._fill.size)
        self.ids_padded = self.ids_padded.at[jnp.asarray(slots)].set(-1)
        self.data = dataclasses.replace(
            self.data, norms_sq=self.data.norms_sq.at[jnp.asarray(slots)]
            .set(jnp.inf))

    def compact(self) -> None:
        """Repack to the minimal aligned slot size, collapsing multi-unit
        clusters back to one probe unit each."""
        cluster_fill = np.bincount(self.unit_owner, weights=self._fill,
                                   minlength=self.k).astype(np.int64)
        self._repack(int(cluster_fill.max()))

    def _repack(self, min_slot: int) -> None:
        live = np.nonzero(self._occupied)[0]
        ext = self.translator.to_external(live)
        x = np.asarray(self.data.vectors)[live][:, : self._d]
        assign = self.unit_owner[(live // self.slot)].astype(np.int64)
        self._init_layout(x, ext, assign, int(dt.pad_to(max(min_slot, 8), 8)))

    def consolidate(self) -> None:
        """No graph to repair; retained for API parity."""


class DynamicIVF:
    """Orchestrator (reference ``svs::DynamicIVF``, orchestrators/
    dynamic_ivf.h)."""

    def __init__(self, index: DynamicIVFIndex):
        self._index = index

    @staticmethod
    def build(parameters: IVFBuildParameters, data, external_ids, distance,
              **kwargs) -> "DynamicIVF":
        clustering = Clustering.build(parameters, data)
        return DynamicIVF(DynamicIVFIndex(clustering, data, external_ids,
                                          distance, **kwargs))

    def search(self, queries, n_neighbors: int) -> QueryResult:
        return self._index.search(queries, n_neighbors)

    def search_async(self, queries, n_neighbors: int):
        return self._index.search_async(queries, n_neighbors)

    def add_points(self, points, external_ids) -> None:
        self._index.add_points(points, external_ids)

    def delete_points(self, external_ids) -> None:
        self._index.delete_points(external_ids)

    def consolidate(self) -> "DynamicIVF":
        self._index.consolidate()
        return self

    def compact(self) -> "DynamicIVF":
        self._index.compact()
        return self

    def all_ids(self) -> np.ndarray:
        return self._index.all_ids()

    def has_id(self, external_id: int) -> bool:
        return self._index.has_id(external_id)

    @property
    def size(self) -> int:
        return self._index.size

    @property
    def dimensions(self) -> int:
        return self._index.dimensions

    @property
    def search_parameters(self):
        return getattr(self._index, "_search_parameters",
                       IVFSearchParameters())

    @property
    def index(self) -> DynamicIVFIndex:
        return self._index
