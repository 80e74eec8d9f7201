"""Entry-point computation for graph indexes.

Analog of the reference's ``compute_medioid`` (``include/svs/core/medioid.h:275``):
component-wise mean of the dataset, then the index of the point nearest to the
mean.  The reference parallelizes with a threadpool; here both phases are
single device ops — a (1, d) x (N, d) matvec plus norm algebra replaces the
per-point scalar loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .data import VectorDataset


def compute_medioid(dataset: VectorDataset) -> int:
    """Return the internal id of the dataset medioid (argmin L2 to the mean)."""
    return int(_medioid_jit(dataset))


@jax.jit
def _medioid_jit(dataset: VectorDataset) -> jax.Array:
    x = dataset.vectors.astype(jnp.float32)
    row_ids = jnp.arange(x.shape[0])
    valid = row_ids < dataset.n
    mean = jnp.sum(jnp.where(valid[:, None], x, 0.0), axis=0) / dataset.n
    # squared L2 to mean via norm algebra; padded rows carry +inf norms.
    dots = x @ mean
    keys = dataset.norms_sq - 2.0 * dots
    keys = jnp.where(valid, keys, jnp.inf)
    return jnp.argmin(keys)
