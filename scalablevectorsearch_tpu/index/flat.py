"""Brute-force (flat) exhaustive search index.

TPU-native analog of the reference's ``FlatIndex``
(``include/svs/index/flat/flat.h:159``).  The reference tiles the dataset into
``data_batch_size`` x ``query_batch_size`` blocks and runs SIMD distance loops
per pair (3-level structure documented at ``flat.h:305-319``); here each block
is one MXU distance matmul and the per-query bounded heaps
(``flat/inserters.h``) become a running (B, k) top-k state merged tile by tile
inside a single ``lax.fori_loop``.

This is also the ground-truth engine: recall targets for every other index are
validated against its output.
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

from ..core.data import VectorDataset
from ..core.query_result import QueryResult
from ..lib import datatypes as dt
from ..lib import saveload
from ..ops import distance as dist_ops
from ..ops import topk as topk_ops


@partial(jax.jit, static_argnames=("k", "tile", "distance"))
def flat_search_kernel(data: VectorDataset, queries: jax.Array, k: int,
                       tile: int, distance: dist_ops.DistanceType,
                       row_mask: Optional[jax.Array] = None):
    """Streaming exhaustive top-k over dataset tiles.

    Args:
      data: dataset whose capacity is a multiple of ``tile``.
      queries: (B, d_pad) device array.
      row_mask: optional (capacity,) bool; False rows are excluded (the
        analog of the reference's predicate filtering, flat.h:321-376).

    Returns: keys (B, k) ascending, ids (B, k) int32 (-1 for missing).
    """
    capacity = data.capacity
    assert capacity % tile == 0, "dataset capacity must be a tile multiple"
    num_tiles = capacity // tile
    b = queries.shape[0]
    q_norms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)

    init_keys = jnp.full((b, k), jnp.inf, dtype=jnp.float32)
    init_ids = jnp.full((b, k), topk_ops.INVALID_ID, dtype=jnp.int32)

    def body(t, carry):
        best_keys, best_ids = carry
        start = t * tile
        # dataset-type extension point: compressed datasets compute keys in
        # the code domain (quantization/scalar.py tile_keys)
        keys = data.tile_keys(queries, q_norms, start, tile, distance)
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        keys = jnp.where((ids < data.n)[None, :], keys, jnp.inf)
        if row_mask is not None:
            tile_mask = jax.lax.dynamic_slice(row_mask, (start,), (tile,))
            keys = jnp.where(tile_mask[None, :], keys, jnp.inf)
        tile_keys, tile_ids = topk_ops.smallest_k(keys, ids, min(k, tile))
        return topk_ops.merge_smallest(best_keys, best_ids,
                                       tile_keys, tile_ids, k)

    return jax.lax.fori_loop(0, num_tiles, body, (init_keys, init_ids))


@partial(jax.jit, static_argnames=("k", "tile", "distance"))
def _flat_serve_batch(data, q, k: int, tile: int,
                      distance: dist_ops.DistanceType, row_mask=None):
    """Fused serving dispatch: tiled scan + key->distance conversion in one
    executable (one dispatch per batch, mirroring Vamana's _search_batch).
    Queries stay full-width f32: the flat index computes ground truths, so
    its results must not carry the half-width upload perturbation the ANN
    serving paths accept."""
    keys, ids = flat_search_kernel(data, q, k, tile, distance,
                                   row_mask=row_mask)
    return ids, dist_ops.value_from_key(distance, keys)


@dataclasses.dataclass
class FlatIndex:
    """Exhaustive index over a device dataset (reference: flat.h:159).

    ``data_batch_size`` / ``query_batch_size`` mirror the reference's tiling
    knobs (defaults at ``flat.h:175``); both are rounded to hardware tiles.
    """

    data: VectorDataset
    distance: dist_ops.DistanceType
    data_batch_size: int = 32768
    query_batch_size: int = 512

    def __post_init__(self):
        self.distance = dist_ops.as_distance(self.distance)
        tile = min(dt.pad_to(self.data_batch_size, 128),
                   dt.pad_to(self.data.capacity, 128))
        # capacity must be a multiple of the tile for clamp-free slicing
        self.data = self.data.with_capacity(dt.pad_to(self.data.capacity, tile))
        self._tile = tile

    @classmethod
    def from_array(cls, x, distance="L2", dtype=None, **kwargs) -> "FlatIndex":
        return cls(VectorDataset.from_array(x, dtype=dtype),
                   dist_ops.as_distance(distance), **kwargs)

    @property
    def size(self) -> int:
        return self.data.n

    @property
    def dimensions(self) -> int:
        return self.data.dim

    def search(self, queries, k: int, row_mask=None,
               cancel=None) -> QueryResult:
        """Batch exhaustive search; returns external-facing QueryResult.

        ``cancel``: optional predicate checked between batches (the
        cancellation hook of reference flat.h:326)."""
        return self.search_async(queries, k, row_mask=row_mask,
                                 cancel=cancel).result()

    def search_async(self, queries, k: int, row_mask=None, cancel=None):
        """Pipelined dispatch (see ``VamanaIndex.search_async``): device
        work + async device->host copies start before this returns."""
        from .vamana.index import PendingSearch
        from ..lib.exceptions import check_cancel
        queries = np.asarray(queries)
        nq, dim = queries.shape
        if dim != self.data.dim:
            raise ValueError(
                f"query dim {dim} != dataset dim {self.data.dim}")
        from .vamana.index import _BatchPlan
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        all_ids = np.empty((nq, k), dtype=np.int64)
        all_vals = np.empty((nq, k), dtype=np.float32)
        mask_dev = None if row_mask is None else jnp.asarray(row_mask)
        # ONE host-side pad, equal-shape batches (one compiled executable),
        # fused per-batch dispatch; f32 uploads — see _flat_serve_batch
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=plan.rows * plan.n_batches,
                               d_pad=self.data.padded_dim)
        pending = []
        for i in range(plan.n_batches):
            check_cancel(cancel)
            q_i = jnp.asarray(q_host[i * plan.rows:(i + 1) * plan.rows])
            ids, vals = _flat_serve_batch(self.data, q_i, k, self._tile,
                                          self.distance, row_mask=mask_dev)
            pending.append((i * plan.rows, ids, vals))
        # start every device->host copy before the first blocking read (each
        # blocking transfer costs a full tunnel round trip)
        for _start, ids, vals in pending:
            vals.copy_to_host_async()
            ids.copy_to_host_async()
        return PendingSearch(pending=pending, rows=plan.rows, nq=nq,
                             out_ids=all_ids, out_vals=all_vals)

    # -- persistence -----------------------------------------------------------
    SCHEMA = "flat_index"
    VERSION = saveload.Version(0, 0, 1)

    def save(self, config_dir: str, data_dir: Optional[str] = None) -> None:
        data_dir = data_dir or config_dir
        saveload.save_to_disk(self.data, data_dir)
        ctx = saveload.SaveContext(config_dir)
        table = saveload.save_table(self.SCHEMA, self.VERSION, {
            "distance": self.distance.value,
        })
        with open(os.path.join(config_dir, "flat_config.json"), "w") as f:
            json.dump(table, f, indent=2)

    @classmethod
    def assemble(cls, config_dir: str, data_dir: Optional[str] = None,
                 **kwargs) -> "FlatIndex":
        data_dir = data_dir or config_dir
        with open(os.path.join(config_dir, "flat_config.json")) as f:
            table = json.load(f)
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        data = saveload.load_from_disk(VectorDataset, data_dir)
        return cls(data, dist_ops.as_distance(table["distance"]), **kwargs)


def exhaustive_search(x, queries, k: int, distance="L2") -> QueryResult:
    """One-shot ground-truth computation (benchmark/test helper)."""
    return FlatIndex.from_array(x, distance=distance).search(queries, k)
