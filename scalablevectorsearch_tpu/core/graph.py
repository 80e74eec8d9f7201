"""Dense padded adjacency graph.

TPU-native analog of the reference's ``SimpleGraph`` / ``SimpleBlockedGraph``
(``include/svs/core/graph/graph.h:388,448``).  The reference stores adjacency
as one dense ``(n, R+1)`` array with an inline length prefix (layout comment
``graph.h:32-48``); here we store a dense ``(capacity, R)`` int32 array padded
with ``-1`` plus a separate ``(capacity,)`` degree vector.  The invariant is
``adjacency[i, degrees[i]:] == -1``, so a single row gather yields a fully
masked neighbor list with no length decode — the shape is static, which is
what ``jit`` and the MXU want.

All mutation is functional (scatter into a new pytree) so graph updates can
live inside compiled build steps.
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

SENTINEL = -1


@partial(jax.tree_util.register_dataclass,
         data_fields=["adjacency", "degrees"],
         meta_fields=["n", "max_degree"])
@dataclasses.dataclass
class NeighborGraph:
    adjacency: jax.Array   # (capacity, R) int32, -1 padded
    degrees: jax.Array     # (capacity,) int32
    n: int                 # static: live node count
    max_degree: int        # static: R

    @classmethod
    def empty(cls, n: int, max_degree: int,
              capacity: Optional[int] = None) -> "NeighborGraph":
        cap = dt.pad_to(capacity if capacity is not None else n, 8)
        adjacency = jnp.full((cap, max_degree), SENTINEL, dtype=jnp.int32)
        degrees = jnp.zeros((cap,), dtype=jnp.int32)
        return cls(adjacency=adjacency, degrees=degrees, n=n,
                   max_degree=max_degree)

    @classmethod
    def from_array(cls, adjacency: np.ndarray, n: Optional[int] = None
                   ) -> "NeighborGraph":
        adjacency = np.asarray(adjacency, dtype=np.int32)
        n = n if n is not None else adjacency.shape[0]
        cap = dt.pad_to(adjacency.shape[0], 8)
        if cap != adjacency.shape[0]:
            pad = np.full((cap - adjacency.shape[0], adjacency.shape[1]),
                          SENTINEL, dtype=np.int32)
            adjacency = np.concatenate([adjacency, pad], axis=0)
        degrees = (adjacency != SENTINEL).sum(axis=1).astype(np.int32)
        return cls(adjacency=jnp.asarray(adjacency),
                   degrees=jnp.asarray(degrees),
                   n=n, max_degree=adjacency.shape[1])

    @property
    def capacity(self) -> int:
        return self.adjacency.shape[0]

    # -- access ---------------------------------------------------------------
    def neighbors(self, ids: jax.Array) -> jax.Array:
        """Gather adjacency rows: (B,) -> (B, R) int32 with -1 padding.
        (reference: ``SimpleGraphBase::get_node`` graph.h:103)."""
        return jnp.take(self.adjacency, ids, axis=0, mode="clip")

    def degrees_of(self, ids: jax.Array) -> jax.Array:
        """Gather node degrees (protocol method so sharded views can
        override with a collective)."""
        return jnp.take(self.degrees, ids, mode="clip")

    # -- mutation (functional) --------------------------------------------------
    def replace_rows(self, ids: jax.Array, rows: jax.Array,
                     new_degrees: jax.Array) -> "NeighborGraph":
        """Replace whole adjacency rows (reference: ``replace_node``
        graph.h:179).  ``rows`` must already be -1-padded past the degree."""
        adjacency = self.adjacency.at[ids].set(rows, mode="drop")
        degrees = self.degrees.at[ids].set(new_degrees, mode="drop")
        return dataclasses.replace(self, adjacency=adjacency, degrees=degrees)

    def scatter_edges(self, dst: jax.Array, slot: jax.Array, src: jax.Array,
                      valid: jax.Array) -> "NeighborGraph":
        """Write edges dst->src at explicit slots (build reverse-edge phase,
        the vectorized analog of ``add_edge`` under per-vertex locks,
        graph.h:211-262).  Invalid entries are dropped."""
        oob = self.capacity * self.max_degree  # dropped by mode="drop"
        flat_idx = jnp.where(valid, dst * self.max_degree + slot, oob)
        flat = self.adjacency.reshape(-1)
        flat = flat.at[flat_idx].set(src.astype(jnp.int32), mode="drop")
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32), jnp.where(valid, dst, self.capacity),
            num_segments=self.capacity + 1)[: self.capacity]
        degrees = self.degrees + counts
        return dataclasses.replace(
            self, adjacency=flat.reshape(self.adjacency.shape),
            degrees=degrees)

    def clear_rows(self, ids: jax.Array) -> "NeighborGraph":
        """Reset adjacency for the given nodes (reference: ``clear_node``
        graph.h:146)."""
        rows = jnp.full((ids.shape[0], self.max_degree), SENTINEL, jnp.int32)
        adjacency = self.adjacency.at[ids].set(rows, mode="drop")
        degrees = self.degrees.at[ids].set(0, mode="drop")
        return dataclasses.replace(self, adjacency=adjacency, degrees=degrees)

    def with_capacity(self, capacity: int) -> "NeighborGraph":
        cap = dt.pad_to(capacity, 8)
        if cap <= self.capacity:
            return self
        grow = cap - self.capacity
        adjacency = jnp.pad(self.adjacency, ((0, grow), (0, 0)),
                            constant_values=SENTINEL)
        degrees = jnp.pad(self.degrees, (0, grow))
        return dataclasses.replace(self, adjacency=adjacency, degrees=degrees)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.adjacency[: self.n])

    # -- stats -------------------------------------------------------------------
    def mean_degree(self) -> float:
        return float(jnp.mean(self.degrees[: self.n].astype(jnp.float32)))

    # -- persistence ---------------------------------------------------------------
    SCHEMA = "default_graph"
    VERSION = saveload.Version(0, 0, 1)

    def save(self, ctx: saveload.SaveContext) -> dict:
        blob = ctx.save_array(self.to_numpy())
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "neighbor graph",
            "binary_file": blob,
            "max_degree": self.max_degree,
            "num_nodes": self.n,
        })

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext) -> "NeighborGraph":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        return cls.from_array(ctx.load_array(table["binary_file"]),
                              n=table["num_nodes"])


def save_adjacency_host(directory: str, adjacency: np.ndarray,
                        n: int = None) -> None:
    """Persist a :class:`NeighborGraph` checkpoint from a HOST adjacency
    array (same on-disk format as :meth:`NeighborGraph.save`).

    At 10M nodes the adjacency is ~1.3 GB; reading it back off the device
    for a plain ``save`` serializes the tunnel (~2 MB/s blocking reads,
    PERF.md round 4).  Callers holding (or chunk-streaming,
    ``lib.transfer.to_host_chunked``) a host copy write it directly."""
    import json
    import os

    adjacency = np.asarray(adjacency, dtype=np.int32)
    n = adjacency.shape[0] if n is None else n
    ctx = saveload.SaveContext(directory)
    table = saveload.save_table(NeighborGraph.SCHEMA, NeighborGraph.VERSION, {
        "name": "neighbor graph",
        "binary_file": ctx.save_array(adjacency[:n]),
        "max_degree": int(adjacency.shape[1]),
        "num_nodes": int(n),
    })
    with open(os.path.join(directory, saveload.CONFIG_FILENAME), "w") as f:
        json.dump(table, f, indent=2)
