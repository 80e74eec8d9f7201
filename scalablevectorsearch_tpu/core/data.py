"""Device-resident vector dataset containers.

TPU-native analog of the reference's ``SimpleData`` / ``BlockedData``
(``include/svs/core/data/simple.h:257,649``).  Instead of a row-major CPU
buffer with hugepage backing, a dataset here is a single padded device array
shaped for the TPU memory system:

  * feature dim padded to the 128-lane width (zero padding preserves L2 and
    inner-product distances);
  * row count padded to the dtype sublane tile, with squared norms cached for
    the norm-algebra distance path (matching how the reference IVF converts
    GEMM results to distances, ``index/ivf/common.h:854-890``);
  * "blocked" growth for dynamic indexes is modeled by over-allocating
    ``capacity`` rows and tracking the live count, so adds are in-place
    ``dynamic_update_slice`` writes instead of reallocation (the analog of
    the reference's blocked resize, ``simple.h:649``).

Datasets are pytrees, so they flow through ``jit``/``shard_map`` unchanged.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lib import datatypes as dt
from ..lib import saveload


@partial(jax.tree_util.register_dataclass,
         data_fields=["vectors", "norms_sq"],
         meta_fields=["n", "dim"])
@dataclasses.dataclass
class VectorDataset:
    """Padded (capacity, d_pad) device array + cached squared norms.

    ``vectors.shape[0]`` is the capacity; rows ``n:`` are zero padding.
    ``norms_sq`` is f32 (capacity,) with padding rows set to +inf so padded
    rows can never win a nearest-neighbor comparison via the norm-algebra
    distance path.
    """

    vectors: jax.Array       # (capacity, d_pad)
    norms_sq: jax.Array      # (capacity,) float32
    n: int                   # static: live row count
    dim: int                 # static: logical feature dim

    # -- construction -------------------------------------------------------
    @classmethod
    def from_array(cls, x, dtype=None, capacity: Optional[int] = None,
                   device=None) -> "VectorDataset":
        x = np.asarray(x)
        if x.ndim != 2:
            raise ValueError(f"expected (n, dim) array, got shape {x.shape}")
        n, dim = x.shape
        if dtype is not None:
            x = x.astype(jnp.dtype(dtype))
        d_pad = dt.padded_dim(dim)
        cap = dt.padded_count(capacity if capacity is not None else n, x.dtype)
        if cap < n:
            raise ValueError(f"capacity {cap} < n {n}")
        host = np.zeros((cap, d_pad), dtype=x.dtype)
        host[:n, :dim] = x
        vectors = jnp.asarray(host)
        if device is not None:
            vectors = jax.device_put(vectors, device)
        return cls(vectors=vectors, norms_sq=_norms_sq(vectors, n),
                   n=n, dim=dim)

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def dtype(self):
        return self.vectors.dtype

    # -- access --------------------------------------------------------------
    def get(self, ids: jax.Array) -> jax.Array:
        """Gather rows by id. Negative / sentinel ids must be pre-clamped by
        the caller (jnp gather clamps out-of-range, which maps -1 to row 0 —
        callers mask those distances to +inf instead)."""
        return jnp.take(self.vectors, ids, axis=0, mode="clip")

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids).astype(jnp.float32)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        """Gather cached squared norms (protocol method so sharded views can
        override with a collective)."""
        return jnp.take(self.norms_sq, ids, axis=0, mode="clip")

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.vectors[: self.n, : self.dim])

    def tile_keys(self, queries: jax.Array, q_norms: jax.Array,
                  start, tile: int, distance) -> jax.Array:
        """Distance keys between all queries and one dataset tile — the
        extension point compressed datasets override with code-domain
        kernels (the analog of the reference's per-dataset ``svs_invoke``
        overloads, extensions/flat/scalar.h)."""
        from ..ops import distance as dist_ops
        xs = jax.lax.dynamic_slice(self.vectors, (start, 0),
                                   (tile, self.vectors.shape[1]))
        ns = jax.lax.dynamic_slice(self.norms_sq, (start,), (tile,))
        return dist_ops.pairwise_keys(distance, queries, xs,
                                      vector_norms_sq=ns,
                                      query_norms_sq=q_norms)

    # -- mutation (functional) ------------------------------------------------
    def set_rows(self, start: int, rows: jax.Array, new_n: Optional[int] = None
                 ) -> "VectorDataset":
        """Functionally write ``rows`` at ``start`` (dynamic_update_slice)."""
        rows = rows.astype(self.dtype)
        if rows.shape[1] != self.padded_dim:
            pad = self.padded_dim - rows.shape[1]
            rows = jnp.pad(rows, ((0, 0), (0, pad)))
        vectors = jax.lax.dynamic_update_slice(self.vectors, rows, (start, 0))
        nrm = jnp.sum(rows.astype(jnp.float32) ** 2, axis=-1)
        norms = jax.lax.dynamic_update_slice(self.norms_sq, nrm, (start,))
        n = new_n if new_n is not None else self.n
        return dataclasses.replace(self, vectors=vectors, norms_sq=norms, n=n)

    def scatter_rows(self, slots: jax.Array, rows: jax.Array,
                     new_n: Optional[int] = None) -> "VectorDataset":
        """Functionally write ``rows`` at arbitrary ``slots`` (dynamic-index
        add path; invalid slots < 0 are dropped)."""
        rows = rows.astype(self.dtype)
        if rows.shape[1] != self.padded_dim:
            rows = jnp.pad(rows, ((0, 0), (0, self.padded_dim
                                           - rows.shape[1])))
        ok = jnp.where(slots >= 0, slots, self.capacity)
        vectors = self.vectors.at[ok].set(rows, mode="drop")
        nrm = jnp.sum(rows.astype(jnp.float32) ** 2, axis=-1)
        norms = self.norms_sq.at[ok].set(nrm, mode="drop")
        return dataclasses.replace(self, vectors=vectors, norms_sq=norms,
                                   n=new_n if new_n is not None else self.n)

    def with_capacity(self, capacity: int) -> "VectorDataset":
        """Grow (pad) the backing arrays to at least ``capacity`` rows."""
        cap = dt.padded_count(capacity, self.dtype)
        if cap <= self.capacity:
            return self
        grow = cap - self.capacity
        vectors = jnp.pad(self.vectors, ((0, grow), (0, 0)))
        norms = jnp.pad(self.norms_sq, (0, grow), constant_values=jnp.inf)
        return dataclasses.replace(self, vectors=vectors, norms_sq=norms)

    # -- persistence -----------------------------------------------------------
    SCHEMA = "uncompressed_data"     # matches the reference's canonical schema
    VERSION = saveload.Version(0, 0, 2)

    def save(self, ctx: saveload.SaveContext) -> dict:
        blob = ctx.save_array(self.to_numpy())
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "vector dataset",
            "binary_file": blob,
            "dims": self.dim,
            "num_vectors": self.n,
            "eltype": str(jnp.dtype(self.dtype).name),
        })

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext,
             dtype=None, capacity: Optional[int] = None) -> "VectorDataset":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        x = ctx.load_array(table["binary_file"])
        if x.dtype.kind == "V":
            # np.save stores extension dtypes (bfloat16) as raw void
            # bytes; view them back through the recorded eltype
            x = x.view(jnp.dtype(table["eltype"]))
        return cls.from_array(x, dtype=dtype or table["eltype"],
                              capacity=capacity)


def save_vectors_host(directory: str, rows: np.ndarray,
                      eltype=None) -> None:
    """Persist a :class:`VectorDataset` checkpoint from a HOST row array
    (same on-disk format as :meth:`VectorDataset.save`).

    Multi-GB device->host readbacks crawl through the remote-TPU tunnel
    (PERF.md round 4); building passes that still hold the host array
    write it directly and ``dispatch_load`` the result."""
    import json
    import os

    rows = np.asarray(rows)
    if eltype is not None:
        rows = rows.astype(jnp.dtype(eltype), copy=False)
    ctx = saveload.SaveContext(directory)
    table = saveload.save_table(VectorDataset.SCHEMA, VectorDataset.VERSION, {
        "name": "vector dataset",
        "binary_file": ctx.save_array(rows),
        "dims": int(rows.shape[1]),
        "num_vectors": int(rows.shape[0]),
        "eltype": str(jnp.dtype(rows.dtype).name),
    })
    with open(os.path.join(directory, saveload.CONFIG_FILENAME), "w") as f:
        json.dump(table, f, indent=2)


@jax.jit
def _norms_sq(vectors: jax.Array, n) -> jax.Array:
    """Row norms with +inf on padding rows.  MUST stay jitted: eager, the
    bf16->f32 upcast materializes a full-size f32 copy of the dataset
    (measured: the 6.25 GB bf16 10M IVF layout OOM'd 16 GB HBM at load
    through the 12.5 GB transient); under jit XLA fuses the upcast and
    square into the tiled reduction."""
    norms = jnp.sum(vectors.astype(jnp.float32) ** 2, axis=-1)
    row_ids = jnp.arange(vectors.shape[0])
    return jnp.where(row_ids < n, norms, jnp.inf)
