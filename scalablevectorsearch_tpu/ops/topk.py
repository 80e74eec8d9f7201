"""Top-k selection and streaming merge primitives.

TPU-native replacement for the reference's per-query bounded heaps / sorting
networks (``include/svs/index/flat/inserters.h``) and sorted search buffers.
Everything operates on whole batches: (B, N) key matrices reduce to
(B, k) smallest keys via ``lax.top_k`` on negated keys, and streaming scans
keep a running (B, k) state merged tile by tile — the dense formulation of the
reference's flat-index 3-level loop (``index/flat/flat.h:305-319``).

All keys are smaller-is-better (see ops.distance); INVALID ids are -1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

INVALID_ID = -1


def smallest_k(keys: jax.Array, ids: jax.Array | None, k: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Select the k smallest keys per row.

    Args:
      keys: (B, N) float32, +inf marks masked entries.
      ids: optional (B, N) or (N,) int32 ids; defaults to column indices.
      k: number of results.

    Returns:
      (B, k) keys ascending, (B, k) ids (INVALID_ID where key is +inf).

    Implementation: ``lax.top_k`` costs O(N*k) on TPU and collapses for
    large k; past a crossover a full row sort + slice is far cheaper, so
    the selection strategy switches on k (the beam/pool maintenance paths
    routinely keep hundreds of candidates).
    """
    n = keys.shape[-1]
    use_sort = k > 64 or 4 * k >= n
    if use_sort:
        if ids is None:
            ids = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32), keys.shape)
        elif ids.ndim == 1:
            ids = jnp.broadcast_to(ids.astype(jnp.int32), keys.shape)
        s_keys, s_ids = jax.lax.sort((keys, ids.astype(jnp.int32)),
                                     dimension=-1, num_keys=1)
        out_keys = s_keys[..., :k]
        out_ids = s_ids[..., :k]
    else:
        neg, idx = jax.lax.top_k(-keys, k)
        out_keys = -neg
        if ids is None:
            out_ids = idx.astype(jnp.int32)
        elif ids.ndim == 1:
            out_ids = jnp.take(ids, idx, axis=0,
                               mode="clip").astype(jnp.int32)
        else:
            out_ids = jnp.take_along_axis(ids, idx, axis=1).astype(jnp.int32)
    out_ids = jnp.where(jnp.isinf(out_keys), INVALID_ID, out_ids)
    return out_keys, out_ids


def merge_smallest(keys_a: jax.Array, ids_a: jax.Array,
                   keys_b: jax.Array, ids_b: jax.Array, k: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Merge two per-row top-k sets into the combined k smallest."""
    keys = jnp.concatenate([keys_a, keys_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    return smallest_k(keys, ids, k)


def sort_by_key(keys: jax.Array, *operands: jax.Array
                ) -> Tuple[jax.Array, ...]:
    """Ascending stable sort of each row by key, carrying operand rows."""
    return jax.lax.sort((keys,) + operands, dimension=-1, num_keys=1)


def mask_duplicate_ids(keys: jax.Array, ids: jax.Array,
                       against_ids: jax.Array) -> jax.Array:
    """Set keys to +inf where ``ids`` (B, R) appear in ``against_ids`` (B, C).

    Vectorized membership test used to keep beam entries unique.  Cost is a
    (B, R, C) broadcast compare on the VPU — cheap at beam sizes.
    """
    dup = jnp.any(ids[:, :, None] == against_ids[:, None, :], axis=-1)
    return jnp.where(dup, jnp.inf, keys)


def mask_first_duplicates(keys: jax.Array, ids: jax.Array) -> jax.Array:
    """Set keys to +inf for repeated ids *within* each row (keep first)."""
    b, r = ids.shape
    eq = ids[:, :, None] == ids[:, None, :]
    earlier = jnp.tril(jnp.ones((r, r), dtype=bool), k=-1)[None]
    dup = jnp.any(eq & earlier, axis=-1)
    return jnp.where(dup & (ids != INVALID_ID), jnp.inf, keys)
