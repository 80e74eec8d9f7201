"""Minimal Lloyd's k-means over device arrays.

Analog of the reference's ``core/kmeans.h`` (``kmeans_clustering``): the small
general-purpose clustering utility.  The production IVF training pipeline
(minibatch + hierarchical, reference ``index/ivf/common.h:563-633``) lives in
``index/ivf/kmeans.py`` and builds on the same assignment primitive.

Assignment is a queries-x-centroids matmul + argmin — exactly the GEMM
formulation the reference uses through MKL (``common.h:241-323``), here on the
MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as dist_ops


def assign_clusters(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """(N, d), (K, d) -> (N,) argmin-L2 assignment via MXU matmul."""
    keys = dist_ops.pairwise_keys(dist_ops.DistanceType.L2, x, centroids)
    return jnp.argmin(keys, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_clusters",))
def _lloyd_step(x: jax.Array, centroids: jax.Array, num_clusters: int
                ) -> Tuple[jax.Array, jax.Array]:
    assign = assign_clusters(x, centroids)
    sums = jax.ops.segment_sum(x, assign, num_segments=num_clusters)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), assign,
                                 num_segments=num_clusters)
    new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # keep empty clusters where they were
    new_centroids = jnp.where((counts > 0)[:, None], new_centroids, centroids)
    return new_centroids, assign


def kmeans_clustering(x, num_clusters: int, num_iterations: int = 10,
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Run Lloyd's iterations; returns (centroids (K, d), assignments (N,))."""
    x = jnp.asarray(np.asarray(x, dtype=np.float32))
    n = x.shape[0]
    if num_clusters > n:
        raise ValueError(f"num_clusters {num_clusters} > n {n}")
    from ..index.ivf.kmeans import _kmeanspp_init
    centroids = _kmeanspp_init(x, seed, num_clusters)
    assign = None
    for _ in range(num_iterations):
        centroids, assign = _lloyd_step(x, centroids, num_clusters)
    return np.asarray(centroids), np.asarray(assign)
