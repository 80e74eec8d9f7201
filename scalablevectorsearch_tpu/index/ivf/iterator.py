"""IVF batch iterator: paged retrieval over one query.

Analog of the reference's IVF ``BatchIterator``
(``include/svs/index/ivf/iterator.h:311``): each page re-probes with a
growing ``n_probes`` and yields the best not-yet-returned ids.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...core.query_result import QueryResult
from .params import IVFSearchParameters


class IVFBatchIterator:
    def __init__(self, index, query, batch_size: int = 10,
                 base_probes: int = 4, probe_step: int = 4):
        self._index = index
        self._query = np.asarray(query, dtype=np.float32).reshape(1, -1)
        if self._query.shape[1] != index.dimensions:
            raise ValueError(
                f"query dim {self._query.shape[1]} != dataset dim "
                f"{index.dimensions}")
        self._batch_size = batch_size
        self._base = base_probes
        self._step = probe_step
        self._iteration = 0
        self._yielded: set[int] = set()
        self._exhausted = False

    @property
    def batch_number(self) -> int:
        return self._iteration

    def done(self) -> bool:
        return self._exhausted

    def restart(self, query=None) -> None:
        if query is not None:
            self._query = np.asarray(query, np.float32).reshape(1, -1)
        self._iteration = 0
        self._yielded.clear()
        self._exhausted = False

    def next(self, batch_size: Optional[int] = None) -> QueryResult:
        m = batch_size or self._batch_size
        probes = min(self._base + self._step * self._iteration,
                     self._index.num_centroids)
        fetch = len(self._yielded) + m
        res = self._index.search(
            self._query, fetch,
            IVFSearchParameters(n_probes=probes))
        fresh_ids, fresh_vals = [], []
        for i, v in zip(res.ids[0], res.distances[0]):
            if i < 0 or int(i) in self._yielded:
                continue
            fresh_ids.append(int(i))
            fresh_vals.append(float(v))
            if len(fresh_ids) == m:
                break
        self._iteration += 1
        if len(fresh_ids) < m:
            self._exhausted = (len(fresh_ids) == 0
                               and probes >= self._index.num_centroids) or \
                (len(self._yielded) + len(fresh_ids) >= self._index.size)
        self._yielded.update(fresh_ids)
        pad = m - len(fresh_ids)
        return QueryResult(
            ids=np.array(fresh_ids + [-1] * pad, dtype=np.int64)[None, :],
            distances=np.array(fresh_vals + [np.inf] * pad,
                               dtype=np.float32)[None, :])
