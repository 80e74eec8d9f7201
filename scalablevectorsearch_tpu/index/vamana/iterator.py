"""Batch iterator: paged "give me the next k" retrieval over one query.

Analog of the reference's ``BatchIterator``
(``include/svs/index/vamana/iterator.h:339``) with restartable schedules that
grow the search window each batch (``iterator_schedule.h``: ``DefaultSchedule``
at :80, ``LinearSchedule`` at :123, type-erased ``AbstractIteratorSchedule``
at :300).

Each ``next()`` re-runs the batched search at the schedule's current window
and yields the best not-yet-returned ids — restartable and stateless on
device (the yielded-set lives on the host, where the reference keeps it too).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Protocol

import jax.numpy as jnp
import numpy as np

from ...core.query_result import QueryResult
from ...lib import datatypes as dt
from ...ops import distance as dist_ops
from . import search as search_mod


class IteratorSchedule(Protocol):
    """Maps iteration number -> (window, capacity) (iterator_schedule.h)."""

    def for_iteration(self, iteration: int) -> tuple[int, int]: ...


@dataclasses.dataclass(frozen=True)
class DefaultSchedule:
    """Window grows by the batch size each iteration
    (iterator_schedule.h:80)."""

    base_window: int
    batch_size: int

    def for_iteration(self, iteration: int) -> tuple[int, int]:
        w = self.base_window + self.batch_size * iteration
        return w, w + self.batch_size


@dataclasses.dataclass(frozen=True)
class LinearSchedule:
    """Window grows by a fixed step (iterator_schedule.h:123)."""

    base_window: int
    step: int

    def for_iteration(self, iteration: int) -> tuple[int, int]:
        w = self.base_window + self.step * iteration
        return w, w


class BatchIterator:
    """Paged retrieval for a single query over a Vamana-style index."""

    def __init__(self, index, query, batch_size: int = 10,
                 schedule: Optional[IteratorSchedule] = None):
        self._index = index
        self._query = np.asarray(query, dtype=np.float32).reshape(1, -1)
        if self._query.shape[1] != index.data.dim:
            raise ValueError(
                f"query dim {self._query.shape[1]} != dataset dim "
                f"{index.data.dim}")
        self._batch_size = batch_size
        self._schedule = schedule or DefaultSchedule(
            max(batch_size, index.search_window_size
                if hasattr(index, "search_window_size") else batch_size),
            batch_size)
        self._iteration = 0
        self._yielded = np.empty(0, dtype=np.int64)   # sorted
        self._exhausted = False

    @property
    def batch_number(self) -> int:
        return self._iteration

    def done(self) -> bool:
        return self._exhausted

    def restart(self, query=None, schedule: Optional[IteratorSchedule] = None
                ) -> None:
        """Reset for a new query (reference iterator 'update')."""
        if query is not None:
            self._query = np.asarray(query, np.float32).reshape(1, -1)
        if schedule is not None:
            self._schedule = schedule
        self._iteration = 0
        self._yielded = np.empty(0, dtype=np.int64)
        self._exhausted = False

    def next(self, batch_size: Optional[int] = None) -> QueryResult:
        """Yield the next batch of neighbors, nearest-first, no repeats.

        The beam stays at the SCHEDULE's (window, capacity) — bounded, like
        the reference's buffer (iterator_schedule.h:80) — while already-
        yielded coverage comes from the search's candidate POOL (the running
        top-``pool_size`` of every scored candidate, a superset of any
        beam's retention).  Deep pages therefore pay a bounded traversal
        plus an O(pool) device merge instead of re-walking with an
        O(pages * m) beam; pool sizes are quantized to powers of two so
        paging reuses executables instead of compiling one per page."""
        m = batch_size or self._batch_size
        index = self._index
        window, capacity = self._schedule.for_iteration(self._iteration)
        capacity = max(capacity, window)
        status = getattr(index, "status", None)
        need = self._yielded.size + m
        if status is not None:
            # dynamic indexes: deleted slots stay traversable until
            # consolidation and occupy pool entries; without headroom for
            # ALL of them a deleted-crowded pool could yield nothing and
            # fake exhaustion while live neighbors remain
            need += int(np.sum(np.asarray(status) == 2))  # SLOT_DELETED
        pool = 1 << int(np.ceil(np.log2(max(need + window, 64))))
        pool = min(pool, int(index.size) + need + capacity)

        batch = dt.pad_matrix(self._query, n_pad=8,
                              d_pad=index.data.padded_dim)
        q = jnp.asarray(batch)
        # honor the index's entry sampler: a sampled-entries-built graph
        # keeps no medioid approach path, so searching from entry_point
        # would strand (entry.py); dynamic indexes rebuild lazily
        if getattr(index, "_sampler_cfg", None) is not None:
            sampler, _ = index._ensure_sampler()
        else:
            sampler = getattr(index, "_entry_sampler", None)
        entry_ids = (sampler.select(index.distance, q)
                     if sampler is not None
                     else jnp.asarray([index.entry_point], dtype=jnp.int32))
        out = search_mod.greedy_search(
            index.graph, index.data, q, entry_ids,
            window=window, capacity=capacity,
            max_iters=search_mod.default_max_iters(window),
            distance=index.distance, pool_size=pool)
        ids = np.asarray(out.pool_ids[0]).astype(np.int64)
        keys = np.asarray(out.pool_keys[0])

        # vectorized filtering (pools run to thousands of entries at deep
        # pages — no per-candidate Python): drop padding, deleted slots
        # (the predicated-buffer analog, dynamic_search_buffer.h), and
        # already-yielded ids, preserving nearest-first pool order
        valid = ids >= 0
        if status is not None:
            st = np.asarray(status)
            valid &= st[np.maximum(ids, 0)] == 1   # SLOT_VALID
        if self._yielded.size:
            valid &= ~np.isin(ids, self._yielded, assume_unique=False)
        pick = np.flatnonzero(valid)[:m]
        fresh_ids = ids[pick]
        fresh_keys = keys[pick].astype(np.float32)
        self._iteration += 1
        if fresh_ids.size < m:
            # either the whole dataset has been yielded, or the growing
            # window produced nothing new — the reachable component is
            # exhausted (unreachable nodes can never be yielded by graph
            # traversal, so size alone is not the criterion)
            self._exhausted = (fresh_ids.size == 0
                               or self._yielded.size + fresh_ids.size
                               >= index.size)
        self._yielded = np.union1d(self._yielded, fresh_ids)

        pad = m - fresh_ids.size
        out_ids = np.concatenate(
            [fresh_ids, np.full(pad, -1, np.int64)])[None, :]
        out_keys = np.concatenate(
            [fresh_keys, np.full(pad, np.inf, np.float32)])[None, :]
        vals = np.array(dist_ops.value_from_key(
            index.distance, jnp.asarray(out_keys)))
        vals[out_ids < 0] = np.inf
        return QueryResult(ids=out_ids, distances=vals)
