"""LeanVec-style dimensionality-reduced search with reranking.

The reference ships LeanVec ([TBAH24]: PCA-style dimensionality reduction for
the graph-search primary + full-precision secondary reranking) only behind
its closed-source runtime ABI (``StorageKind::LeanVec*``,
``bindings/cpp/include/svs/runtime/api_defs.h:98-109``;
``LeanVecTrainingData`` training.h:28-71).  This is an open TPU-native
equivalent:

* **train**: mean-center a sample, take the top ``target_dim`` right singular
  vectors (exact eigendecomposition of the d x d covariance — d is small);
  when a *query* training set is supplied (``train(x, queries=...)``, the
  reference's ``LeanVecTrainingData`` carries separate data/query arrays),
  use the query-aware OOD objective instead (see :meth:`LeanVecDataset.train`);
* **primary**: LVQ-compressed projected vectors — graph search runs in the
  reduced space (fewer HBM bytes per gather, fewer MACs per distance);
* **secondary**: LVQ-compressed full-dimensional vectors used to re-score
  the top ``rerank_multiplier * k`` candidates.

``LeanVecVamana`` wraps a Vamana index over the primary with query projection
+ reranking at the search boundary.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.query_result import QueryResult
from ..lib import saveload
from ..ops import distance as dist_ops
from ..ops import topk as topk_ops
from .lvq import LVQDataset


def _ood_projections(data_centered: np.ndarray, queries_raw: np.ndarray,
                     target_dim: int, ridge: float = 1e-6):
    """Query-aware (OOD) projection pair, [TBAH24] closed form.

    Minimizes the expected inner-product distortion
    ``E[(q^T x - (B q)^T (A x))^2] = || Q^{1/2} (I - B^T A) D^{1/2} ||_F^2``
    over rank-``target_dim`` maps, where ``D = E[x x^T]`` (data centered by
    the data mean) and ``Q = E[q q^T]`` (queries RAW — subtracting any
    constant from q adds a per-row bias ``-c^T M x`` to every query's
    ranking, measurably corrupting MIP recall) are the two second-moment
    matrices.  In whitened coordinates every rank-d' factor is reachable, so
    the optimum is the truncated SVD of ``S = Q^{1/2} D^{1/2}``:

        A = Sigma^{1/2} V_d'^T D^{-1/2}   (data map)
        B = Sigma^{1/2} U_d'^T Q^{-1/2}   (query map)

    — the generalized-eigenproblem solution on (D, Q).  When queries and data
    are identically distributed this reduces to PCA up to a rotation.
    Returns ``(A^T, B^T)`` as (d, d') matrices applied as ``x @ A^T``.
    """
    d = data_centered.shape[1]

    def sqrt_pair(mat):
        lam, vec = np.linalg.eigh(mat.astype(np.float64))
        lam = np.maximum(lam, ridge * max(lam.max(), 1e-30))
        return (vec * np.sqrt(lam)) @ vec.T, \
            (vec / np.sqrt(lam)) @ vec.T
    D = data_centered.T.astype(np.float64) @ data_centered / \
        data_centered.shape[0]
    Q = queries_raw.T.astype(np.float64) @ queries_raw / \
        queries_raw.shape[0]
    D_half, D_inv_half = sqrt_pair(D)
    Q_half, Q_inv_half = sqrt_pair(Q)
    u, sig, vt = np.linalg.svd(Q_half @ D_half)
    root = np.sqrt(sig[:target_dim])
    a_t = D_inv_half @ vt[:target_dim].T * root[None, :]   # (d, d')
    b_t = Q_inv_half @ u[:, :target_dim] * root[None, :]   # (d, d')
    assert a_t.shape == (d, target_dim)
    return a_t.astype(np.float32), b_t.astype(np.float32)


@dataclasses.dataclass
class LeanVecDataset:
    """Projection + primary (reduced) + secondary (full) datasets.

    ``projection`` is the data map; ``query_projection`` the query map.  The
    two differ only for query-aware (OOD) training — the data-only PCA path
    uses one orthonormal map for both (then ``query_projection is
    projection``).  ``query_mean`` is the centering applied to queries
    before projection: the data mean for PCA, zero for the OOD pair (whose
    objective uses the raw query second moment — see
    :func:`_ood_projections`).
    """

    mean: np.ndarray              # (d,)
    projection: np.ndarray        # (d, d') data map
    primary: LVQDataset           # over projected vectors (n, d')
    secondary: LVQDataset         # over full vectors (n, d)
    query_projection: np.ndarray = None  # (d, d') query map
    query_mean: np.ndarray = None        # (d,) query centering

    def __post_init__(self):
        if self.query_projection is None:
            self.query_projection = self.projection
        if self.query_mean is None:
            self.query_mean = self.mean

    @classmethod
    def train(cls, x, target_dim: Optional[int] = None, *,
              queries=None, training_sample: int = 100_000, seed: int = 0
              ) -> "LeanVecDataset":
        """Fit the reduction.  With ``queries`` (a representative query
        training set — the reference's ``LeanVecTrainingData``,
        ``bindings/cpp/include/svs/runtime/training.h:28-71``, takes separate
        data/query arrays) the projection pair optimizes the query-aware
        OOD objective; without, data-only PCA."""
        x = np.asarray(x, dtype=np.float32)
        n, d = x.shape
        target_dim = target_dim or max(d // 2, 8)
        if target_dim > d:
            raise ValueError(f"target_dim {target_dim} > dim {d}")
        rng = np.random.default_rng(seed)
        sample = x[rng.choice(n, size=min(n, training_sample),
                              replace=False)] if n > training_sample else x
        mean = sample.mean(axis=0)
        centered = (sample - mean).astype(np.float64)
        if queries is not None:
            q = np.asarray(queries, dtype=np.float32)
            if q.ndim != 2 or q.shape[1] != d:
                raise ValueError(
                    f"query training set must be (m, {d}), got {q.shape}")
            if q.shape[0] > training_sample:
                q = q[rng.choice(q.shape[0], size=training_sample,
                                 replace=False)]
            projection, query_projection = _ood_projections(
                centered.astype(np.float32), q, target_dim)
            query_mean = np.zeros(d, dtype=np.float32)
        else:
            cov = centered.T @ centered / centered.shape[0]
            _eigvals, eigvecs = np.linalg.eigh(cov)
            projection = eigvecs[:, ::-1][:, :target_dim].astype(np.float32)
            query_projection = projection
            query_mean = None   # post_init: data mean
        projected = (x - mean) @ projection
        return cls(mean=mean.astype(np.float32), projection=projection,
                   primary=LVQDataset.compress(projected),
                   secondary=LVQDataset.compress(x),
                   query_projection=query_projection,
                   query_mean=query_mean)

    @property
    def n(self) -> int:
        return self.primary.n

    @property
    def dim(self) -> int:
        return self.secondary.dim

    @property
    def reduced_dim(self) -> int:
        return self.primary.dim

    def project_queries(self, queries: np.ndarray) -> np.ndarray:
        q = np.asarray(queries, dtype=np.float32)
        return (q - self.query_mean) @ self.query_projection

    # -- persistence -----------------------------------------------------------
    SCHEMA = "leanvec_dataset"
    VERSION = saveload.Version(0, 0, 2)   # 0.0.2: optional query_projection

    def save_to(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        saveload.save_to_disk(self.primary,
                              os.path.join(directory, "primary"))
        saveload.save_to_disk(self.secondary,
                              os.path.join(directory, "secondary"))
        ctx = saveload.SaveContext(directory)
        body = {
            "mean": ctx.save_array(self.mean),
            "projection": ctx.save_array(self.projection),
        }
        if self.query_projection is not self.projection:
            body["query_projection"] = ctx.save_array(self.query_projection)
            body["query_mean"] = ctx.save_array(self.query_mean)
        table = saveload.save_table(self.SCHEMA, self.VERSION, body)
        with open(os.path.join(directory, "leanvec_config.json"), "w") as f:
            json.dump(table, f, indent=2)

    @classmethod
    def load_from(cls, directory: str) -> "LeanVecDataset":
        with open(os.path.join(directory, "leanvec_config.json")) as f:
            table = json.load(f)
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        ctx = saveload.LoadContext(directory)
        from ..core.loading import dispatch_load
        qproj = (ctx.load_array(table["query_projection"])
                 if "query_projection" in table else None)
        qmean = (ctx.load_array(table["query_mean"])
                 if "query_mean" in table else None)
        return cls(mean=ctx.load_array(table["mean"]),
                   projection=ctx.load_array(table["projection"]),
                   primary=dispatch_load(os.path.join(directory, "primary")),
                   secondary=dispatch_load(
                       os.path.join(directory, "secondary")),
                   query_projection=qproj, query_mean=qmean)


class LeanVecVamana:
    """Vamana over the reduced-dimension primary with full-dim reranking."""

    def __init__(self, index, leanvec: LeanVecDataset,
                 rerank_multiplier: int = 3):
        self._index = index
        self._leanvec = leanvec
        self.rerank_multiplier = rerank_multiplier

    @classmethod
    def build(cls, parameters, data, distance, *,
              target_dim: Optional[int] = None,
              rerank_multiplier: int = 3, queries=None,
              **kwargs) -> "LeanVecVamana":
        """``queries``: optional query training set enabling query-aware
        (OOD) projection training (reference training.h:28-71)."""
        from ..index.vamana.index import VamanaIndex
        leanvec = data if isinstance(data, LeanVecDataset) else \
            LeanVecDataset.train(data, target_dim=target_dim,
                                 queries=queries)
        index = VamanaIndex.build(parameters, leanvec.primary, distance,
                                  **kwargs)
        return cls(index, leanvec, rerank_multiplier)

    @property
    def size(self) -> int:
        return self._index.size

    @property
    def dimensions(self) -> int:
        return self._leanvec.dim

    @property
    def search_window_size(self) -> int:
        return self._index.search_window_size

    @search_window_size.setter
    def search_window_size(self, w: int) -> None:
        self._index.search_window_size = w

    def enable_entry_sampler(self, n_samples=None,
                             n_entries: int = 1, seed: int = 0) -> None:
        """Per-query sampled entries on the reduced-dim primary (entry.py);
        selection happens on the projected queries inside the fused
        dispatch, so the sample and the beam live in the same space."""
        self._index.enable_entry_sampler(n_samples, n_entries, seed)

    def disable_entry_sampler(self) -> None:
        self._index.disable_entry_sampler()

    def search(self, queries, k: int) -> QueryResult:
        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        if queries.shape[1] != self._leanvec.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != {self._leanvec.dim}")
        fetch = max(k * self.rerank_multiplier, k)
        inner = self._index.search(self._leanvec.project_queries(queries),
                                   fetch)
        # rerank with the full-dimensional secondary
        from ..index.ivf.index import rerank_kernel
        from ..lib import datatypes as dt
        sec = self._leanvec.secondary
        qdev = jnp.asarray(dt.pad_matrix(
            queries.astype(np.float32), n_pad=dt.pad_to(queries.shape[0], 8),
            d_pad=sec.padded_dim))
        cand = jnp.asarray(np.pad(
            inner.ids, ((0, qdev.shape[0] - inner.ids.shape[0]), (0, 0)),
            constant_values=-1).astype(np.int32))
        keys, ids = rerank_kernel(sec, qdev, None, cand, k=k,
                                  distance=self._index.distance)
        nq = queries.shape[0]
        return QueryResult(
            ids=np.asarray(ids[:nq], dtype=np.int64),
            distances=np.array(dist_ops.value_from_key(
                self._index.distance, keys[:nq])))

    def save(self, config_dir: str) -> None:
        self._index.save(os.path.join(config_dir, "index"))
        self._leanvec.save_to(os.path.join(config_dir, "leanvec"))

    @classmethod
    def assemble(cls, config_dir: str, rerank_multiplier: int = 3,
                 **kwargs) -> "LeanVecVamana":
        from ..index.vamana.index import VamanaIndex
        index = VamanaIndex.assemble(os.path.join(config_dir, "index"),
                                     **kwargs)
        leanvec = LeanVecDataset.load_from(os.path.join(config_dir,
                                                        "leanvec"))
        return cls(index, leanvec, rerank_multiplier)
