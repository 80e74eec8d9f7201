"""Device mesh helpers.

The reference's scaling axes are threadpools + NUMA partitioning
(``lib/threads/``, ``lib/numa.h``); the TPU-native equivalents are named mesh
axes over ICI (SURVEY §5 "parallel decompositions"):

* ``dp`` — query/batch parallelism (the analog of the reference's
  query-parallel ``StaticPartition`` over search batches, index.h:563);
* ``shard`` — dataset-row parallelism (the analog of NUMA data partitioning
  and IVF posting-list distribution), merged with all-gather top-k.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))


def make_mesh_2d(dp: int, shard: int,
                 names: Sequence[str] = ("dp", "shard")) -> Mesh:
    """2-D mesh: query-parallel x dataset-sharded."""
    devices = jax.devices()
    if dp * shard > len(devices):
        raise ValueError(
            f"mesh {dp}x{shard} needs {dp * shard} devices, have "
            f"{len(devices)}")
    arr = np.array(devices[: dp * shard]).reshape(dp, shard)
    return Mesh(arr, tuple(names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis_name: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))
