"""Dynamic (mutable) flat index.

Analog of the reference's ``DynamicFlatIndex``
(``include/svs/index/flat/dynamic_flat.h``): blocked dataset + id translation
+ slot lifecycle, exhaustive search with the deleted slots masked out via the
flat kernel's predicate path (no graph to maintain, so delete/consolidate are
trivial).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.data import VectorDataset
from ..core.query_result import QueryResult
from ..core.translation import IDTranslator
from ..lib import datatypes as dt
from ..ops import distance as dist_ops
from ..ops import topk as topk_ops
from .flat import _flat_serve_batch

SLOT_EMPTY, SLOT_VALID = 0, 1


class DynamicFlatIndex:
    def __init__(self, data, external_ids, distance, *,
                 capacity: Optional[int] = None,
                 data_batch_size: int = 32768,
                 query_batch_size: int = 512, logger=None):
        x = np.asarray(data, dtype=np.float32)
        n = x.shape[0]
        self.distance = dist_ops.as_distance(distance)
        cap = dt.padded_count(capacity if capacity is not None
                              else max(2 * n, 64), np.float32)
        self.data = VectorDataset.from_array(x, capacity=cap)
        self.status = np.full(cap, SLOT_EMPTY, dtype=np.int8)
        self.status[:n] = SLOT_VALID
        self.valid_mask = jnp.asarray(self.status == SLOT_VALID)
        self.translator = IDTranslator(cap)
        self.translator.insert(np.asarray(external_ids, np.int64),
                               np.arange(n, dtype=np.int64))
        self.data_batch_size = data_batch_size
        self.query_batch_size = query_batch_size

    @property
    def size(self) -> int:
        return int((self.status == SLOT_VALID).sum())

    @property
    def dimensions(self) -> int:
        return self.data.dim

    def all_ids(self) -> np.ndarray:
        return np.sort(self.translator.all_external_ids())

    def has_id(self, external_id: int) -> bool:
        return external_id in self.translator

    # -- search ----------------------------------------------------------------
    def search(self, queries, k: int, cancel=None) -> QueryResult:
        """``cancel``: optional zero-arg predicate checked between query
        batch dispatches (reference cancel hooks,
        tests/integration/cancel.cpp)."""
        from ..lib.exceptions import check_cancel
        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self.data.dim:
            raise ValueError(f"query dim {dim} != dataset dim {self.data.dim}")
        tile = min(dt.pad_to(self.data_batch_size, 128),
                   dt.pad_to(self.data.capacity, 128))
        data = self.data.with_capacity(dt.pad_to(self.data.capacity, tile))
        mask = self.valid_mask
        if mask.shape[0] < data.capacity:
            mask = jnp.pad(mask, (0, data.capacity - mask.shape[0]))
        from .vamana.index import _BatchPlan
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_vals = np.empty((nq, k), dtype=np.float32)
        # fused equal-shape dispatches + async device->host copies (see
        # FlatIndex.search_async); f32 uploads for exactness
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=plan.rows * plan.n_batches,
                               d_pad=data.padded_dim)
        pending = []
        for i in range(plan.n_batches):
            check_cancel(cancel)
            q_i = jnp.asarray(q_host[i * plan.rows:(i + 1) * plan.rows])
            ids, vals = _flat_serve_batch(data, q_i, k, tile, self.distance,
                                          row_mask=mask)
            pending.append((i * plan.rows, ids, vals))
        for _start, ids, vals in pending:
            ids.copy_to_host_async()
            vals.copy_to_host_async()
        for start, ids, vals in pending:
            stop = min(start + plan.rows, nq)
            slots = np.asarray(ids)[: stop - start]
            out_ids[start:stop] = np.where(
                slots >= 0, self.translator.to_external(slots), -1)
            out_vals[start:stop] = np.asarray(vals)[: stop - start]
        return QueryResult(ids=out_ids, distances=out_vals)

    # -- mutation ------------------------------------------------------------------
    def add_points(self, points, external_ids) -> np.ndarray:
        points = np.asarray(points, dtype=np.float32)
        external_ids = np.asarray(external_ids, np.int64)
        m = points.shape[0]
        empty = np.nonzero(self.status == SLOT_EMPTY)[0]
        empty = empty[empty < self.data.n]
        reuse = empty[:m]
        n_new = m - reuse.size
        high = self.data.n
        slots = np.concatenate([reuse,
                                np.arange(high, high + n_new)]).astype(np.int64)
        if high + n_new > self.data.capacity:
            new_cap = dt.padded_count(
                max(2 * self.data.capacity, high + n_new), np.float32)
            self.data = self.data.with_capacity(new_cap)
            self.status = np.pad(self.status,
                                 (0, new_cap - self.status.size))
        self.translator.insert(external_ids, slots)
        rows = jnp.asarray(dt.pad_matrix(points, n_pad=m,
                                         d_pad=self.data.padded_dim))
        self.data = self.data.scatter_rows(jnp.asarray(slots), rows,
                                           new_n=high + n_new)
        self.status[slots] = SLOT_VALID
        self.valid_mask = jnp.asarray(self.status == SLOT_VALID)
        return slots

    def delete_points(self, external_ids) -> None:
        slots = self.translator.remove(external_ids)
        self.status[slots] = SLOT_EMPTY
        self.valid_mask = jnp.asarray(self.status == SLOT_VALID)

    def consolidate(self) -> None:
        """No-op for flat (nothing references deleted slots)."""

    def compact(self) -> None:
        high = self.data.n
        alive = np.nonzero(self.status[:high] == SLOT_VALID)[0]
        if alive.size == high:
            return
        vectors = np.asarray(self.data.vectors)[alive][:, : self.data.dim]
        self.data = VectorDataset.from_array(vectors,
                                             capacity=self.data.capacity)
        new_status = np.full(self.status.size, SLOT_EMPTY, np.int8)
        new_status[: alive.size] = SLOT_VALID
        self.status = new_status
        self.valid_mask = jnp.asarray(self.status == SLOT_VALID)
        old_to_new = np.full(high, -1, dtype=np.int64)
        old_to_new[alive] = np.arange(alive.size)
        self.translator.remap(old_to_new)
