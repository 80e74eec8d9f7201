"""Batched distance computation on the MXU.

TPU-native replacement for the reference's hand-written AVX-512 distance
kernels (``include/svs/core/distance/{euclidean,inner_product,cosine}.h``).
Where the reference computes one (query, candidate) pair per SIMD loop, here
the unit of work is a dense distance *matrix*: ``Q (B, d) x X (N, d) ->
(B, N)`` via a single matmul plus norm algebra, the same trick the reference's
IVF uses to convert GEMM results to L2 distances (``index/ivf/common.h:854-890``)
— promoted to the universal distance path since matmul is where TPU FLOPs live.

Ordering convention: all internal computations produce **keys** where smaller
is better, for every metric (MIP and cosine keys are negated similarities).
Public distances are recovered with :func:`value_from_key`, matching the
reference's per-metric comparator (``concepts/distance.h`` comparator CPO).

L2 keys are *squared* euclidean distances, as in the reference
(``euclidean.h`` computes squared L2).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp


class DistanceType(enum.Enum):
    """Runtime distance enum (reference: ``DistanceType`` core/distance.h:41)."""

    L2 = "L2"
    MIP = "MIP"
    Cosine = "Cosine"


def _precision_from_env(var: str, default: str):
    import os
    name = os.environ.get(var, default).upper()
    return {"DEFAULT": jax.lax.Precision.DEFAULT,
            "HIGH": jax.lax.Precision.HIGH,
            "HIGHEST": jax.lax.Precision.HIGHEST}[name]


# Matmul precision knobs (TPU: DEFAULT=1-pass bf16, HIGH=3-pass, HIGHEST=
# 6-pass).  Beam/candidate scoring defaults to HIGHEST (bf16 noise measurably
# degrades neighbor ordering); the build-time prune pairwise matrix has its
# own knob since it dominates build FLOPs.
SCORE_PRECISION = _precision_from_env("SVT_SCORE_PRECISION", "HIGHEST")
PRUNE_PRECISION = _precision_from_env("SVT_PRUNE_PRECISION", "HIGHEST")


def as_distance(d) -> DistanceType:
    if isinstance(d, DistanceType):
        return d
    name = str(d).lower()
    aliases = {"l2": "L2", "euclidean": "L2", "mip": "MIP", "ip": "MIP",
               "inner_product": "MIP", "innerproduct": "MIP",
               "cosine": "Cosine", "cosine_similarity": "Cosine"}
    if name not in aliases:
        raise ValueError(f"unknown distance {d!r}")
    return DistanceType(aliases[name])


def dot_matrix(queries: jax.Array, vectors: jax.Array,
               precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Q (B, d) x X (N, d) -> (B, N) f32 inner products on the MXU."""
    return jax.lax.dot_general(
        queries, vectors,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def pairwise_keys(distance: DistanceType,
                  queries: jax.Array,
                  vectors: jax.Array,
                  vector_norms_sq: Optional[jax.Array] = None,
                  query_norms_sq: Optional[jax.Array] = None,
                  precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Full (B, N) key matrix between query rows and dataset rows.

    ``vector_norms_sq`` (N,) may carry +inf for padding rows, which makes
    padded rows lose every comparison (L2) — for MIP/cosine padding rows are
    all-zero so their similarity is 0 / undefined; callers searching over
    padded datasets mask by id count instead.
    """
    distance = as_distance(distance)
    qf = queries.astype(jnp.float32) if queries.dtype == jnp.float64 else queries
    dots = dot_matrix(qf, vectors, precision=precision)
    if distance == DistanceType.MIP:
        return -dots
    if vector_norms_sq is None:
        vector_norms_sq = jnp.sum(
            vectors.astype(jnp.float32) ** 2, axis=-1)
    if distance == DistanceType.L2:
        if query_norms_sq is None:
            query_norms_sq = jnp.sum(qf.astype(jnp.float32) ** 2, axis=-1)
        keys = (query_norms_sq[:, None] - 2.0 * dots
                + vector_norms_sq[None, :])
        return jnp.maximum(keys, 0.0) + jnp.where(
            jnp.isinf(vector_norms_sq)[None, :], jnp.inf, 0.0)
    # Cosine: key = -dot / (|q| * |x|); query norm is a per-row positive
    # scale that does not change per-query ordering, but we keep it so the
    # public value is the true cosine similarity (reference cosine.h:49-83
    # caches the query norm in fix_argument).
    if query_norms_sq is None:
        query_norms_sq = jnp.sum(qf.astype(jnp.float32) ** 2, axis=-1)
    denom = jnp.sqrt(jnp.maximum(query_norms_sq[:, None], 1e-30)) * \
        jnp.sqrt(jnp.maximum(vector_norms_sq[None, :], 1e-30))
    keys = -dots / denom
    return keys + jnp.where(jnp.isinf(vector_norms_sq)[None, :], jnp.inf, 0.0)


def gathered_keys(distance: DistanceType,
                  queries: jax.Array,
                  gathered: jax.Array,
                  gathered_norms_sq: Optional[jax.Array] = None,
                  query_norms_sq: Optional[jax.Array] = None) -> jax.Array:
    """Keys between each query and its own gathered candidates.

    ``queries`` (B, d), ``gathered`` (B, R, d) -> (B, R) f32 keys.  This is the
    beam-search inner step: a batched matvec + norm algebra on the VPU (the
    gather from HBM dominates; see SURVEY §7 hard part 3).
    """
    distance = as_distance(distance)
    qf = queries.astype(jnp.float32)
    gf = gathered.astype(jnp.float32)
    # high precision: the TPU default would run this contraction in
    # bf16, which visibly degrades neighbor ordering and graph quality
    dots = jnp.einsum("bd,brd->br", qf, gf, precision=SCORE_PRECISION)
    if distance == DistanceType.MIP:
        return -dots
    if gathered_norms_sq is None:
        gathered_norms_sq = jnp.sum(gf * gf, axis=-1)
    if query_norms_sq is None:
        query_norms_sq = jnp.sum(qf * qf, axis=-1)
    if distance == DistanceType.L2:
        return jnp.maximum(
            query_norms_sq[:, None] - 2.0 * dots + gathered_norms_sq, 0.0)
    denom = jnp.sqrt(jnp.maximum(query_norms_sq[:, None], 1e-30)) * \
        jnp.sqrt(jnp.maximum(gathered_norms_sq, 1e-30))
    return -dots / denom


def value_from_key(distance: DistanceType, keys: jax.Array) -> jax.Array:
    """Convert internal smaller-is-better keys to public distances."""
    distance = as_distance(distance)
    if distance == DistanceType.L2:
        return keys
    return -keys


def key_from_value(distance: DistanceType, values: jax.Array) -> jax.Array:
    distance = as_distance(distance)
    if distance == DistanceType.L2:
        return values
    return -values
