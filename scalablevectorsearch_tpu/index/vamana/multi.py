"""Multi-vector dynamic index: many vectors per external label.

Analog of the reference's ``MultiMutableVamanaIndex``
(``include/svs/index/vamana/multi.h:155``): each external label owns any
number of vectors; searches deduplicate by label, returning each label once
at its best distance (the reference's label-deduplicating
``MultiBatchIterator``, multi.h:31).

Implemented over :class:`MutableVamanaIndex` with a label layer on top of the
per-vector external ids: internal per-vector ids are hidden, label mapping is
host-side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...core.query_result import QueryResult
from .dynamic import MutableVamanaIndex
from .params import VamanaBuildParameters, VamanaSearchParameters


class MultiMutableVamanaIndex:
    def __init__(self, parameters: VamanaBuildParameters, data, labels,
                 distance, **kwargs):
        data = np.asarray(data, dtype=np.float32)
        labels = np.asarray(labels, dtype=np.int64)
        if data.shape[0] != labels.size:
            raise ValueError("data / labels length mismatch")
        self._next_vid = data.shape[0]
        vids = np.arange(data.shape[0], dtype=np.int64)
        self._vid_to_label = {int(v): int(l) for v, l in zip(vids, labels)}
        self._label_counts: dict[int, int] = {}
        for l in labels:
            self._label_counts[int(l)] = self._label_counts.get(int(l), 0) + 1
        self._inner = MutableVamanaIndex(parameters, data, vids, distance,
                                         **kwargs)

    # -- properties ----------------------------------------------------------
    @property
    def size(self) -> int:
        """Number of distinct labels (reference multi.h size semantics)."""
        return len(self._label_counts)

    @property
    def num_vectors(self) -> int:
        return self._inner.size

    @property
    def dimensions(self) -> int:
        return self._inner.dimensions

    @property
    def search_parameters(self) -> VamanaSearchParameters:
        return self._inner.search_parameters

    @search_parameters.setter
    def search_parameters(self, p) -> None:
        self._inner.search_parameters = p

    @property
    def search_window_size(self) -> int:
        return self._inner.search_window_size

    @search_window_size.setter
    def search_window_size(self, w: int) -> None:
        self._inner.search_window_size = w

    def all_labels(self) -> np.ndarray:
        return np.sort(np.fromiter(self._label_counts.keys(), dtype=np.int64))

    def has_id(self, label: int) -> bool:
        return int(label) in self._label_counts

    # -- search ----------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[VamanaSearchParameters] = None
               ) -> QueryResult:
        """Label-deduplicated top-k: over-fetch vectors, keep each label's
        best hit (multi.h MultiBatchIterator semantics)."""
        mean_mult = max(self.num_vectors / max(self.size, 1), 1.0)
        fetch = int(min(max(k * (1 + mean_mult), 2 * k),
                        max(self.num_vectors, k)))
        inner_res = self._inner.search(queries, fetch, parameters=parameters)
        nq = inner_res.n_queries
        out_ids = np.full((nq, k), -1, dtype=np.int64)
        out_vals = np.full((nq, k), np.inf, dtype=np.float32)
        for qi in range(nq):
            seen: set[int] = set()
            j = 0
            for vid, val in zip(inner_res.ids[qi], inner_res.distances[qi]):
                if vid < 0:
                    continue
                label = self._vid_to_label.get(int(vid))
                if label is None or label in seen:
                    continue
                seen.add(label)
                out_ids[qi, j] = label
                out_vals[qi, j] = val
                j += 1
                if j == k:
                    break
        return QueryResult(ids=out_ids, distances=out_vals)

    # -- mutation -----------------------------------------------------------------
    def add_points(self, points, labels) -> None:
        """Add vectors under (possibly pre-existing) labels."""
        points = np.asarray(points, dtype=np.float32)
        labels = np.asarray(labels, dtype=np.int64)
        vids = np.arange(self._next_vid, self._next_vid + points.shape[0],
                         dtype=np.int64)
        self._next_vid += points.shape[0]
        self._inner.add_points(points, vids)
        for v, l in zip(vids, labels):
            self._vid_to_label[int(v)] = int(l)
            self._label_counts[int(l)] = self._label_counts.get(int(l), 0) + 1

    def delete_points(self, labels) -> None:
        """Delete every vector belonging to the given labels."""
        doomed = set(int(l) for l in np.asarray(labels).ravel())
        missing = doomed - set(self._label_counts)
        if missing:
            raise KeyError(f"labels not present: {sorted(missing)[:10]}")
        vids = [v for v, l in self._vid_to_label.items() if l in doomed]
        self._inner.delete_points(np.asarray(vids, dtype=np.int64))
        for v in vids:
            del self._vid_to_label[v]
        for l in doomed:
            del self._label_counts[l]

    def consolidate(self) -> None:
        self._inner.consolidate()

    def compact(self) -> None:
        self._inner.compact()
