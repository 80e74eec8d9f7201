"""Vamana orchestrator — the user-facing type-dynamic API.

Analog of the reference's type-erased ``svs::Vamana`` orchestrator
(``include/svs/orchestrators/vamana.h:287-676``) and its Python binding
surface (``bindings/python/src/vamana.cpp``).  In Python there is no template
erasure to perform; this class provides the same entry points — ``build``,
``assemble``, ``search``, chained parameter accessors, save — over the
underlying :class:`VamanaIndex`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.query_result import QueryResult
from ..index.vamana.index import VamanaIndex
from ..index.vamana.params import (VamanaBuildParameters,
                                   VamanaSearchParameters)
from ..ops import distance as dist_ops


class Vamana:
    """User-facing static Vamana index manager."""

    def __init__(self, index: VamanaIndex):
        self._index = index

    # -- construction -------------------------------------------------------
    @staticmethod
    def build(parameters: VamanaBuildParameters, data, distance,
              dtype=None, **kwargs) -> "Vamana":
        """Build an index from an (n, d) array, file path, or dataset
        (reference orchestrators/vamana.h:570-600)."""
        data = _load_if_path(data, dtype)
        return Vamana(VamanaIndex.build(parameters, data, distance,
                                        dtype=dtype, **kwargs))

    @staticmethod
    def assemble(config_dir: str, graph_dir: Optional[str] = None,
                 data_dir: Optional[str] = None, dtype=None,
                 **kwargs) -> "Vamana":
        """Load a saved index (reference vamana.h:420-454)."""
        return Vamana(VamanaIndex.assemble(config_dir, graph_dir, data_dir,
                                           dtype=dtype, **kwargs))

    # -- search ---------------------------------------------------------------
    def search(self, queries, n_neighbors: int) -> QueryResult:
        return self._index.search(queries, n_neighbors)

    def search_async(self, queries, n_neighbors: int):
        """Dispatch-only search; pipeline several calls and collect with
        ``.result()`` (see VamanaIndex.search_async)."""
        return self._index.search_async(queries, n_neighbors)

    # -- TPU serving levers (no reference analog; see PERF.md) -------------------
    def enable_packed_serving(self, *args, **kwargs) -> None:
        """Packed-neighborhood serving (see VamanaIndex.enable_packed_serving)."""
        self._index.enable_packed_serving(*args, **kwargs)

    def disable_packed_serving(self) -> None:
        self._index.disable_packed_serving()

    def enable_entry_sampler(self, n_samples=None,
                             n_entries: int = 1, seed: int = 0) -> None:
        """Per-query sampled entry points (see
        VamanaIndex.enable_entry_sampler and index/vamana/entry.py)."""
        self._index.enable_entry_sampler(n_samples, n_entries, seed)

    def disable_entry_sampler(self) -> None:
        self._index.disable_entry_sampler()

    def enable_host_rerank(self, host_vectors) -> None:
        """Exact host-side re-scoring of the returned beam — restores
        f16-level recall under int8 query uploads (see
        VamanaIndex.enable_host_rerank and PERF.md round 5)."""
        self._index.enable_host_rerank(host_vectors)

    def disable_host_rerank(self) -> None:
        self._index.disable_host_rerank()

    @property
    def pop_width(self) -> int:
        """Beam entries expanded per lockstep iteration (multi-pop; see
        greedy_search pop_width).  Larger values halve sequential
        iterations at ~equal total work — measured Pareto-better at high
        recall (m=8 w=11: 0.944 vs m=4's 0.912 at equal QPS, PERF.md)."""
        return self._index.pop_width

    @pop_width.setter
    def pop_width(self, m: int) -> None:
        self._index.pop_width = m

    # -- parameter surface ------------------------------------------------------
    @property
    def search_window_size(self) -> int:
        return self._index.search_window_size

    @search_window_size.setter
    def search_window_size(self, window: int) -> None:
        self._index.search_window_size = window

    @property
    def search_parameters(self) -> VamanaSearchParameters:
        return self._index.search_parameters

    @search_parameters.setter
    def search_parameters(self, params: VamanaSearchParameters) -> None:
        self._index.search_parameters = params

    @property
    def alpha(self) -> float:
        bp = self._index.build_parameters
        return bp.alpha if bp else float("nan")

    @property
    def graph_max_degree(self) -> int:
        return self._index.graph.max_degree

    @property
    def size(self) -> int:
        return self._index.size

    @property
    def dimensions(self) -> int:
        return self._index.dimensions

    @property
    def distance(self) -> dist_ops.DistanceType:
        return self._index.distance

    # -- misc --------------------------------------------------------------------
    def reconstruct_at(self, ids) -> np.ndarray:
        return self._index.reconstruct_at(ids)

    def save(self, config_dir: str, graph_dir: Optional[str] = None,
             data_dir: Optional[str] = None) -> None:
        self._index.save(config_dir, graph_dir, data_dir)

    def save_stream(self, stream) -> None:
        """(reference vamana.h:457 stream save)"""
        self._index.save_stream(stream)

    @staticmethod
    def assemble_stream(stream, **kwargs) -> "Vamana":
        return Vamana(VamanaIndex.assemble_stream(stream, **kwargs))

    def get_distance(self, internal_id: int, query) -> float:
        """Distance between a stored vector and a query (reference
        vamana.h:671)."""
        import numpy as np
        from ..ops.distance import DistanceType
        vec = self._index.reconstruct_at([internal_id])[0]
        q = np.asarray(query, dtype=np.float32).reshape(-1)
        if q.shape[0] != self._index.data.dim:
            raise ValueError(
                f"query dim {q.shape[0]} != {self._index.data.dim}")
        if self._index.distance == DistanceType.L2:
            return float(((q - vec) ** 2).sum())
        ip = float(q @ vec)
        if self._index.distance == DistanceType.MIP:
            return ip
        return ip / max(float(np.linalg.norm(q) * np.linalg.norm(vec)),
                        1e-30)

    @property
    def index(self) -> VamanaIndex:
        return self._index


def _load_if_path(data, dtype):
    if isinstance(data, str):
        from ..core.io import read_any
        return read_any(data, dtype=dtype)
    return data
