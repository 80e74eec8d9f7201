"""IVF k-means training: minibatch + hierarchical.

TPU-native analog of the reference's IVF training pipeline:

* minibatch k-means with per-centroid counts-based learning rates and
  empty/tiny-cluster splitting (``kmeans_training``,
  ``include/svs/index/ivf/common.h:563-633``; ``centroid_adjustment`` /
  ``centroid_split`` ``common.h:450-543``);
* 2-level hierarchical training: level-1 over ~sqrt-split, then per-cluster
  level-2 with proportional centroid allocation
  (``hierarchical_kmeans.h:28-47,68-200``).

Assignment is a queries-x-centroids MXU matmul + argmin — the exact GEMM
formulation the reference routes through MKL (``compute_matmul``,
``common.h:241-323``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import distance as dist_ops
from .params import IVFBuildParameters


@partial(jax.jit, static_argnames=())
def _assign(x: jax.Array, centroids: jax.Array,
            centroid_norms: jax.Array) -> jax.Array:
    """argmin-L2 assignment via norm algebra (common.h:854-890): the q-norm
    term is constant per row so only -2qc + |c|^2 is needed."""
    dots = dist_ops.dot_matrix(x, centroids)
    keys = centroid_norms[None, :] - 2.0 * dots
    return jnp.argmin(keys, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_centroids",))
def _minibatch_step(batch: jax.Array, centroids: jax.Array,
                    counts: jax.Array, num_centroids: int):
    """One minibatch update: assign, then move each centroid toward its
    members with a 1/count learning rate (Sculley-style; matches the
    reference's running-count update in kmeans_training)."""
    cn = jnp.sum(centroids * centroids, axis=-1)
    assign = _assign(batch, centroids, cn)
    batch_counts = jax.ops.segment_sum(
        jnp.ones((batch.shape[0],), jnp.float32), assign,
        num_segments=num_centroids)
    batch_sums = jax.ops.segment_sum(batch, assign,
                                     num_segments=num_centroids)
    new_counts = counts + batch_counts
    # target = running mean of all points seen so far
    lr = jnp.where(new_counts > 0, batch_counts / jnp.maximum(new_counts, 1.0),
                   0.0)
    means = batch_sums / jnp.maximum(batch_counts, 1.0)[:, None]
    centroids = jnp.where(
        (batch_counts > 0)[:, None],
        centroids + lr[:, None] * (means - centroids), centroids)
    return centroids, new_counts, assign


@partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(x: jax.Array, seed, k: int) -> jax.Array:
    """k-means++ seeding as one device loop: each step samples a point with
    probability proportional to its squared distance from the chosen set
    (D^2 sampling), then folds the new centroid into the running min-D^2
    with a single matvec.  Avoids the merged/split local optima random init
    falls into (the failure mode the reference mitigates with its
    centroid_adjustment machinery, common.h:450-543)."""
    n, d = x.shape
    x = x.astype(jnp.float32)
    x_norm = jnp.sum(x * x, axis=-1)
    key0 = jax.random.PRNGKey(seed)
    first = jax.random.randint(key0, (), 0, n)
    c0 = x[first]
    min_d2 = jnp.maximum(x_norm - 2.0 * (x @ c0) + jnp.sum(c0 * c0), 0.0)
    centroids0 = jnp.zeros((k, d), jnp.float32).at[0].set(c0)

    def body(i, state):
        centroids, min_d2, key = state
        key, sub = jax.random.split(key)
        idx = jax.random.categorical(sub, jnp.log(min_d2 + 1e-30))
        c = x[idx]
        centroids = centroids.at[i].set(c)
        d2 = jnp.maximum(x_norm - 2.0 * (x @ c) + jnp.sum(c * c), 0.0)
        return centroids, jnp.minimum(min_d2, d2), key

    centroids, _, _ = jax.lax.fori_loop(
        1, k, body, (centroids0, min_d2, key0))
    return centroids


def _split_empty(centroids: np.ndarray, counts: np.ndarray,
                 rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Empty-cluster handling (common.h:450-543): replace each dead centroid
    with a jittered copy of the centroid with the largest count."""
    dead = counts < 1.0
    if not dead.any():
        return centroids, counts
    order = np.argsort(-counts)
    donors = order[: int(dead.sum())]
    idx_dead = np.nonzero(dead)[0]
    for d, donor in zip(idx_dead, donors):
        jitter = rng.normal(scale=1e-3, size=centroids.shape[1])
        centroids[d] = centroids[donor] + jitter
        counts[d] = counts[donor] / 2
        counts[donor] = counts[donor] / 2
    return centroids, counts


def kmeans_training(x: np.ndarray, num_centroids: int, *,
                    minibatch_size: int, num_iterations: int,
                    seed: int) -> np.ndarray:
    """Minibatch k-means; returns (num_centroids, d) f32 centroids."""
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    num_centroids = min(num_centroids, n)
    rng = np.random.default_rng(seed)
    centroids = _kmeanspp_init(jnp.asarray(x), seed, num_centroids)
    counts = jnp.zeros((num_centroids,), jnp.float32)
    mb = min(minibatch_size, n)
    for it in range(num_iterations):
        order = rng.permutation(n)
        for start in range(0, n, mb):
            sel = order[start: start + mb]
            if sel.size < mb:  # static shapes: wrap the tail
                sel = np.concatenate([sel, order[: mb - sel.size]])
            batch = jnp.asarray(x[sel])
            centroids, counts, _ = _minibatch_step(
                batch, centroids, counts, num_centroids)
        c_host = np.asarray(centroids)
        n_host = np.asarray(counts)
        c_host, n_host = _split_empty(c_host, n_host, rng)
        centroids, counts = jnp.asarray(c_host), jnp.asarray(n_host)
    return np.asarray(centroids)


def hierarchical_kmeans(x: np.ndarray, num_centroids: int, *,
                        minibatch_size: int, num_iterations: int,
                        seed: int) -> np.ndarray:
    """2-level training (hierarchical_kmeans.h:68-200): level-1 with
    ~sqrt(num_centroids) clusters, then per-level-1-cluster level-2 k-means
    with centroids allocated proportionally to cluster mass."""
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    num_centroids = min(num_centroids, n)
    k1 = max(int(np.sqrt(num_centroids)), 1)
    level1 = kmeans_training(x, k1, minibatch_size=minibatch_size,
                             num_iterations=num_iterations, seed=seed)
    assign = assign_full(x, level1)
    counts = np.bincount(assign, minlength=k1).astype(np.float64)

    # proportional allocation (hierarchical_kmeans.h:28-47)
    alloc = np.maximum(np.rint(counts / counts.sum() * num_centroids), 1
                       ).astype(np.int64)
    while alloc.sum() > num_centroids:
        alloc[np.argmax(alloc)] -= 1
    while alloc.sum() < num_centroids:
        alloc[np.argmax(counts / alloc)] += 1

    out = []
    rng = np.random.default_rng(seed + 1)
    for c in range(k1):
        members = x[assign == c]
        kc = int(alloc[c])
        if members.shape[0] == 0:
            out.append(level1[c][None, :].repeat(kc, axis=0)
                       + rng.normal(scale=1e-3, size=(kc, x.shape[1])))
            continue
        kc = min(kc, members.shape[0])
        out.append(kmeans_training(
            members, kc, minibatch_size=minibatch_size,
            num_iterations=max(num_iterations // 2, 2),
            seed=seed + 2 + c))
    centroids = np.concatenate(out, axis=0).astype(np.float32)
    return centroids[:num_centroids]


def assign_full(x: np.ndarray, centroids: np.ndarray,
                batch: int = 65536) -> np.ndarray:
    """Full-dataset cluster assignment in batches (common.h:775-850)."""
    x = np.asarray(x, dtype=np.float32)
    c = jnp.asarray(centroids, dtype=jnp.float32)
    cn = jnp.sum(c * c, axis=-1)
    out = np.empty(x.shape[0], dtype=np.int32)
    for start in range(0, x.shape[0], batch):
        xb = jnp.asarray(x[start: start + batch])
        out[start: start + xb.shape[0]] = np.asarray(_assign(xb, c, cn))
    return out


def train_clustering(x: np.ndarray, params: IVFBuildParameters
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Full training pipeline: sample -> train -> assign everything.

    Returns (centroids (K, d) f32, assignments (n,) int32).
    """
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    params = params.resolved(n)
    rng = np.random.default_rng(params.seed)
    n_train = max(int(n * params.training_fraction), params.num_centroids)
    n_train = min(n_train, n)
    sample = x[rng.choice(n, size=n_train, replace=False)] \
        if n_train < n else x
    trainer = hierarchical_kmeans if params.is_hierarchical else \
        kmeans_training
    centroids = trainer(sample, params.num_centroids,
                        minibatch_size=params.minibatch_size,
                        num_iterations=params.num_iterations,
                        seed=params.seed)
    return centroids.astype(np.float32), assign_full(x, centroids)
