"""Entry-point computation for graph indexes.

Analog of the reference's ``compute_medioid`` (``include/svs/core/medioid.h:275``):
component-wise mean of the dataset, then the index of the point nearest to the
mean.  The reference parallelizes with a threadpool; here both phases are
tiled device loops over the dataset protocol (so compressed datasets decode
tile-by-tile instead of materializing), with the arg-min phase reusing the
``tile_keys`` distance extension point.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def compute_medioid(dataset, tile: int = 16384) -> int:
    """Return the internal id of the dataset medioid (argmin L2 to the mean)."""
    tile = min(tile, dataset.capacity)
    while dataset.capacity % tile != 0:
        tile //= 2
    return int(_medioid_jit(dataset, tile))


@partial(jax.jit, static_argnames=("tile",))
def _medioid_jit(dataset, tile: int) -> jax.Array:
    capacity = dataset.capacity
    num_tiles = capacity // tile
    d_pad = dataset.padded_dim

    def sum_body(t, acc):
        ids = t * tile + jnp.arange(tile, dtype=jnp.int32)
        rows = dataset.get_f32(ids)
        valid = (ids < dataset.n)[:, None]
        return acc + jnp.sum(jnp.where(valid, rows, 0.0), axis=0)

    total = jax.lax.fori_loop(0, num_tiles, sum_body,
                              jnp.zeros((d_pad,), jnp.float32))
    mean = (total / dataset.n)[None, :]
    mean_norm = jnp.sum(mean * mean, axis=-1)

    def argmin_body(t, carry):
        best_key, best_id = carry
        keys = dataset.tile_keys(mean, mean_norm, t * tile, tile, "L2")[0]
        ids = t * tile + jnp.arange(tile, dtype=jnp.int32)
        keys = jnp.where(ids < dataset.n, keys, jnp.inf)
        pos = jnp.argmin(keys)
        better = keys[pos] < best_key
        return (jnp.where(better, keys[pos], best_key),
                jnp.where(better, ids[pos], best_id))

    _, best = jax.lax.fori_loop(0, num_tiles, argmin_body,
                                (jnp.inf, jnp.int32(0)))
    return best
