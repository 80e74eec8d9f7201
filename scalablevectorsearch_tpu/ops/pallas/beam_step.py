"""Fully-fused beam-search iteration Pallas kernel (score + merge + pop).

One kernel per lockstep search iteration performs *everything* after the HBM
row-gather — the entire inner loop of the reference's greedy traversal
(``include/svs/index/vamana/greedy_search.h:124-203``): distance computation,
visited/duplicate filtering (``filter.h:46``), sorted-buffer insertion
(``search_buffer.h``), and next-pop selection — in a single VMEM-resident
pass that reads the gathered candidate rows exactly once.

Why this shape wins (PERF.md ablation, B=2048, W=48, M=4, ~1.3 ms/iter):

* candidate scoring (~0.72 ms) is memory-bound on the ``(B, K, d)`` f32
  intermediates XLA materializes for the batched matvec (``'bd,bkd->bk'``
  cannot use the MXU: N=1).  Here the multiply+reduce happens in VMEM as the
  gathered block streams in — one read of the gathered bytes, f32 accumulate;
* dedup masks, beam sort-merge, and pop bookkeeping (~0.45 ms as 4-5 separate
  XLA ops) ride along for free in the same kernel.

The merge itself is cheaper than a full sort: candidates are sorted by key at
width K (narrow bitonic sort), then combined with the already-sorted beam as
an ascending//descending bitonic sequence, so one O(log n) bitonic *merge*
pass at full width replaces the O(log^2 n) full-width sort.

Contract mirrors :mod:`.beam_update` (packed visited bit 30, +inf invalid
keys); candidate scoring adds the gathered vectors + query block as inputs.
The per-iteration pool output (for build-mode candidate tracking,
``vamana_build.h:409-446``) matches the XLA path's semantics exactly:
within-iteration duplicates are masked, beam-resident duplicates are NOT
masked from the pool (they were pool-merged when first scored, and the build
dedups the pool once before pruning).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .beam_update import (ID_MASK, VIS_BIT, _INT_BIG, _next_pow2, _partner,
                          bitonic_sort)

# metric codes (static kernel params; avoids importing ops.distance here)
L2, MIP, COSINE = 0, 1, 2


def bitonic_merge(keys: jax.Array, payloads, roll=jnp.roll):
    """Ascending bitonic *merge* along the last axis (power-of-2 length).

    Input must be a bitonic sequence (e.g. ascending run followed by a
    descending run).  O(log n) compare-exchange stages vs the full sort's
    O(log^2 n)."""
    single = not isinstance(payloads, (tuple, list))
    if single:
        payloads = (payloads,)
    payloads = tuple(payloads)
    n = keys.shape[-1]
    assert n & (n - 1) == 0, f"bitonic length {n} not a power of 2"
    idx = jax.lax.broadcasted_iota(jnp.int32, keys.shape, keys.ndim - 1)
    j = n // 2
    while j >= 1:
        lj = j.bit_length() - 1
        take_min = ((idx >> lj) & 1) == 0
        pk = _partner(keys, j, roll)
        new_keys = jnp.where(take_min, jnp.minimum(keys, pk),
                             jnp.maximum(keys, pk))
        moved = new_keys != keys
        payloads = tuple(
            jnp.where(moved, _partner(p, j, roll), p) for p in payloads)
        keys = new_keys
        j //= 2
    if single:
        return keys, payloads[0]
    return keys, payloads


def _score_block(vecs, queries, *, metric: int, decode=None):
    """(bb, K, d) rows + (bb, d) queries -> (bb, K) smaller-is-better keys.

    f32 multiply+reduce on the VPU — a single pass over the gathered bytes
    (``ops.distance.gathered_keys`` semantics, HIGHEST-precision equivalent:
    the products and accumulator are full f32).

    ``decode``: optional (scales, biases, mean, n_dead) LVQ-8 parameters —
    ``vecs`` then holds int8 primary codes and the kernel reconstructs
    ``mean + bias + scale * code`` in VMEM registers before scoring (the
    fused decode+distance path: the gathered code bytes are read once and
    the (bb, K, d) f32 decode never exists in HBM).  ``n_dead`` is the
    number of zero-padded trailing lanes: they decode to exactly ``bias``
    (mean and codes are 0 there), so their squared-norm contribution is
    subtracted analytically instead of masking a live-lane vector in."""
    qf = queries.astype(jnp.float32)
    if decode is None:
        vf = vecs.astype(jnp.float32)
        dead_x2 = 0.0
    else:
        scales, biases, mean, n_dead = decode
        vf = (mean[None, :, :] + biases[:, :, None]
              + scales[:, :, None] * vecs.astype(jnp.float32))
        # dead query lanes are zero-padded, so dots are unaffected; only
        # the norm needs the correction
        dead_x2 = jnp.float32(n_dead) * biases * biases    # (bb, K)
    dots = jnp.sum(vf * qf[:, None, :], axis=2)          # (bb, K)
    if metric == MIP:
        return -dots
    x2 = jnp.sum(vf * vf, axis=2) - dead_x2              # (bb, K)
    if metric == L2:
        qn = jnp.sum(qf * qf, axis=1)                    # (bb,)
        return jnp.maximum(qn[:, None] - 2.0 * dots + x2, 0.0)
    # cosine: negated similarity
    qn = jnp.sum(qf * qf, axis=1)
    denom = jnp.sqrt(jnp.maximum(qn[:, None], 1e-30)) * \
        jnp.sqrt(jnp.maximum(x2, 1e-30))
    return -dots / denom


def _beam_step_body(beam_keys, beam_packed, vecs, cand_ids, queries, *,
                    metric: int, window: int, m: int, roll, decode=None):
    """Shared math for the kernel and its XLA reference path."""
    bb, c = beam_keys.shape
    k = cand_ids.shape[1]
    kp = _next_pow2(k)
    one = jnp.int32(1)
    zero = jnp.int32(0)

    # ---- 1. score --------------------------------------------------------
    keys = _score_block(vecs, queries, metric=metric, decode=decode)
    valid = jnp.where(cand_ids >= 0, one, zero)
    keys = jnp.where(valid == 1, keys, jnp.inf)

    # ---- 2. within-iteration dedup: narrow sort by id --------------------
    sortid = jnp.where(valid == 1, cand_ids, _INT_BIG)
    if kp > k:
        sortid = jnp.concatenate(
            [sortid, jnp.full((bb, kp - k), _INT_BIG, jnp.int32)], axis=1)
        keys = jnp.concatenate(
            [keys, jnp.full((bb, kp - k), jnp.inf, jnp.float32)], axis=1)
        cand_ids = jnp.concatenate(
            [cand_ids, jnp.full((bb, kp - k), -1, jnp.int32)], axis=1)
    sortid, (keys, cand_ids) = bitonic_sort(sortid, (keys, cand_ids),
                                            roll=roll)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (bb, kp), 1)
    prev = roll(sortid, 1, 1)
    live = jnp.where(sortid != _INT_BIG, one, zero)
    dup = (jnp.where(iota_k > 0, one, zero)
           * jnp.where(sortid == prev, one, zero) * live)
    keys = jnp.where(dup == 1, jnp.inf, keys)

    # pool view: within-iteration dups masked, beam-resident dups retained
    # (matches the XLA path's mask_first_duplicates -> merge_smallest order)
    pool_keys = keys[:, :k] if kp > k else keys
    pool_ids = cand_ids[:, :k] if kp > k else cand_ids

    # ---- 3. beam-membership mask (vs-beam dedup) --------------------------
    beam_live = jnp.isfinite(beam_keys)                              # (bb, c)
    beam_ids = jnp.where(beam_live, beam_packed & ID_MASK, -1)
    in_beam = jnp.sum(
        jnp.where(beam_ids[:, :, None] == cand_ids[:, None, :], one, zero),
        axis=1)                                                      # (bb, kp)
    keys = jnp.where(in_beam > 0, jnp.inf, keys)

    # ---- 4. narrow sort by key, descending --------------------------------
    neg_keys, cand_ids = bitonic_sort(-keys, cand_ids, roll=roll)

    # ---- 5. wide bitonic merge with the sorted beam ------------------------
    lp = _next_pow2(c + kp)
    pad = lp - c - kp
    mid_f = [jnp.full((bb, pad), jnp.inf, jnp.float32)] if pad else []
    mid_i = [jnp.full((bb, pad), -1, jnp.int32)] if pad else []
    # ascending beam, +inf plateau, descending candidates => bitonic
    merged_keys = jnp.concatenate([beam_keys] + mid_f + [-neg_keys], axis=1)
    merged_packed = jnp.concatenate([beam_packed] + mid_i + [cand_ids],
                                    axis=1)
    merged_keys, merged_packed = bitonic_merge(merged_keys, merged_packed,
                                               roll=roll)
    new_keys = merged_keys[:, :c]
    new_packed = merged_packed[:, :c]

    # ---- 6. pop selection --------------------------------------------------
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bb, c), 1)
    big = jnp.int32(lp)
    unvis = (jnp.where(jnp.isfinite(new_keys), one, zero)
             * jnp.where((new_packed >> 30) == 0, one, zero)
             * jnp.where(iota_c < window, one, zero))
    hits = jnp.zeros((bb, c), dtype=jnp.int32)
    popped_cols = []
    for _ in range(m):
        pos = jnp.min(jnp.where(unvis == 1, iota_c, big), axis=1,
                      keepdims=True)
        has = pos[:, 0] < big
        hit = jnp.where(iota_c == pos, one, zero) * unvis
        pid = jnp.sum(hit * (new_packed & ID_MASK), axis=1)
        popped_cols.append(jnp.where(has, pid, -1).astype(jnp.int32))
        unvis = unvis * (1 - hit)
        hits = jnp.maximum(hits, hit)
    new_packed = jnp.where(hits == 1, new_packed | VIS_BIT, new_packed)
    popped = jnp.stack(popped_cols, axis=1)
    return new_keys, new_packed, popped, pool_keys, pool_ids


def _kernel(beam_keys_ref, beam_packed_ref, vecs_ref, cand_ids_ref,
            queries_ref, out_keys_ref, out_packed_ref, popped_ref,
            pool_keys_ref, pool_ids_ref, *, metric, window, m):
    new_keys, new_packed, popped, pk, pi = _beam_step_body(
        beam_keys_ref[:], beam_packed_ref[:], vecs_ref[:], cand_ids_ref[:],
        queries_ref[:], metric=metric, window=window, m=m, roll=pltpu.roll)
    out_keys_ref[:] = new_keys
    out_packed_ref[:] = new_packed
    popped_ref[:] = popped
    pool_keys_ref[:] = pk
    pool_ids_ref[:] = pi


def _kernel_lvq(beam_keys_ref, beam_packed_ref, codes_ref, scales_ref,
                biases_ref, mean_ref, cand_ids_ref, queries_ref,
                out_keys_ref, out_packed_ref, popped_ref,
                pool_keys_ref, pool_ids_ref, *, metric, window, m, n_dead):
    new_keys, new_packed, popped, pk, pi = _beam_step_body(
        beam_keys_ref[:], beam_packed_ref[:], codes_ref[:], cand_ids_ref[:],
        queries_ref[:], metric=metric, window=window, m=m, roll=pltpu.roll,
        decode=(scales_ref[:], biases_ref[:], mean_ref[:], n_dead))
    out_keys_ref[:] = new_keys
    out_packed_ref[:] = new_packed
    popped_ref[:] = popped
    pool_keys_ref[:] = pk
    pool_ids_ref[:] = pi


def _pick_block_rows(b: int, k: int, d: int, itemsize: int,
                     c: int = 0) -> int:
    """Largest power-of-2 row block keeping the kernel's scoped-VMEM
    footprint in budget.

    Two terms dominate, both linear in the row block:
    * the f32 *work* block ``bb * k * d * 4`` (the kernel upcasts bf16
      inputs, so input itemsize underestimates the live set: a bf16
      (128,128,128) block measured 24 MB scoped VMEM and OOM'd the 16 MB
      limit);
    * the beam merge/sort temporaries ``bb * P * ~256 B`` with ``P`` the
      pow2-padded sort width ``next_pow2(c + k)`` — fitted from two
      measured scoped-VMEM points (c=512, k=128, bb=64 -> 21.66 MB;
      c=5000, bb=8 -> 16.8 MB; both ~64 f32-pair copies per sorted entry).
    """
    del itemsize  # f32 upcast dominates regardless of input dtype
    budget = 14 * 1024 * 1024     # stay under the 16 MB scoped-vmem limit
    sort_width = 1
    while sort_width < c + k:
        sort_width *= 2
    per_row = k * d * 4 + (sort_width * 256 if c else 0)
    bb = budget // max(per_row, 1)
    p = 8
    while p * 2 <= min(bb, 128, max(8, b)):
        p *= 2
    return p


@partial(jax.jit, static_argnames=("metric", "window", "m", "block_rows",
                                   "interpret"))
def beam_step(beam_keys: jax.Array, beam_packed: jax.Array,
              vecs: jax.Array, cand_ids: jax.Array, queries: jax.Array, *,
              metric: int, window: int, m: int, block_rows: int = 0,
              interpret: bool = False):
    """Score gathered candidate rows and fold them into the beam; pop next m.

    Args:
      beam_keys: (B, C) f32 sorted ascending, +inf = empty slot.
      beam_packed: (B, C) int32, ``id | visited << 30``.
      vecs: (B, K, d) gathered candidate rows (f32 or bf16; upcast in-kernel).
      cand_ids: (B, K) int32 candidate ids, -1 = invalid.
      queries: (B, d) query block (f32 or bf16).
      metric: 0=L2, 1=MIP, 2=cosine (static).
      window: pop horizon; m: pop width.

    Returns:
      (new_keys (B, C), new_packed (B, C), popped (B, m) int32,
      pool_keys (B, K) f32, pool_ids (B, K) int32) — pool_* are the scored
      candidates with within-iteration duplicates masked (+inf), for
      build-mode pool tracking.
    """
    b, c = beam_keys.shape
    k = cand_ids.shape[1]
    d = vecs.shape[2]
    if not block_rows:
        block_rows = _pick_block_rows(b, k, d, vecs.dtype.itemsize, c=c)
    bb = min(block_rows, max(8, b))
    pad_rows = (-b) % bb
    if pad_rows:
        beam_keys = jnp.pad(beam_keys, ((0, pad_rows), (0, 0)),
                            constant_values=jnp.inf)
        beam_packed = jnp.pad(beam_packed, ((0, pad_rows), (0, 0)),
                              constant_values=-1)
        vecs = jnp.pad(vecs, ((0, pad_rows), (0, 0), (0, 0)))
        cand_ids = jnp.pad(cand_ids, ((0, pad_rows), (0, 0)),
                           constant_values=-1)
        queries = jnp.pad(queries, ((0, pad_rows), (0, 0)))
    bp = b + pad_rows
    grid = (bp // bb,)
    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (bb, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bb, k, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, metric=metric, window=window, m=m),
        grid=grid,
        in_specs=[row_spec(c), row_spec(c), vec_spec, row_spec(k),
                  row_spec(d)],
        out_specs=[row_spec(c), row_spec(c), row_spec(m), row_spec(k),
                   row_spec(k)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, c), jnp.float32),
            jax.ShapeDtypeStruct((bp, c), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        interpret=interpret,
    )(beam_keys, beam_packed, vecs, cand_ids, queries)
    if pad_rows:
        out = [o[:b] for o in out]
    return out


@partial(jax.jit, static_argnames=("metric", "window", "m", "n_dead",
                                   "block_rows", "interpret"))
def beam_step_lvq(beam_keys: jax.Array, beam_packed: jax.Array,
                  codes: jax.Array, scales: jax.Array, biases: jax.Array,
                  mean: jax.Array, cand_ids: jax.Array, queries: jax.Array,
                  *, metric: int, window: int, m: int, n_dead: int,
                  block_rows: int = 0, interpret: bool = False):
    """Fused LVQ-8 decode + score + merge + pop (BASELINE's fused
    decode+distance kernel).

    Like :func:`beam_step` but the candidate block holds int8 primary codes
    (``quantization/lvq.py`` one-level layout) plus per-candidate (scale,
    bias) and the dataset mean; the f32 reconstruction happens in VMEM
    registers, so the decoded (B, K, d) block never exists in HBM — the
    XLA LVQ path materializes it twice (decode output + score operand).

    Args beyond :func:`beam_step`:
      codes: (B, K, d_pad) int8 gathered primary code rows.
      scales / biases: (B, K) f32 per-candidate level-1 constants.
      mean: (1, d_pad) f32 dataset mean (zero in dead lanes).
      n_dead: static count of zero-padded trailing lanes (d_pad - dim);
        each decodes to exactly ``bias``, corrected analytically in the
        squared-norm term.
    """
    b, c = beam_keys.shape
    k = cand_ids.shape[1]
    d = codes.shape[2]
    if not block_rows:
        block_rows = _pick_block_rows(b, k, d, 4, c=c)
    bb = min(block_rows, max(8, b))
    pad_rows = (-b) % bb
    if pad_rows:
        beam_keys = jnp.pad(beam_keys, ((0, pad_rows), (0, 0)),
                            constant_values=jnp.inf)
        beam_packed = jnp.pad(beam_packed, ((0, pad_rows), (0, 0)),
                              constant_values=-1)
        codes = jnp.pad(codes, ((0, pad_rows), (0, 0), (0, 0)))
        scales = jnp.pad(scales, ((0, pad_rows), (0, 0)))
        biases = jnp.pad(biases, ((0, pad_rows), (0, 0)))
        cand_ids = jnp.pad(cand_ids, ((0, pad_rows), (0, 0)),
                           constant_values=-1)
        queries = jnp.pad(queries, ((0, pad_rows), (0, 0)))
    bp = b + pad_rows
    grid = (bp // bb,)
    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (bb, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    code_spec = pl.BlockSpec((bb, k, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    mean_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel_lvq, metric=metric, window=window, m=m,
                n_dead=n_dead),
        grid=grid,
        in_specs=[row_spec(c), row_spec(c), code_spec, row_spec(k),
                  row_spec(k), mean_spec, row_spec(k), row_spec(d)],
        out_specs=[row_spec(c), row_spec(c), row_spec(m), row_spec(k),
                   row_spec(k)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, c), jnp.float32),
            jax.ShapeDtypeStruct((bp, c), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        interpret=interpret,
    )(beam_keys, beam_packed, codes, scales, biases, mean, cand_ids,
      queries)
    if pad_rows:
        out = [o[:b] for o in out]
    return out


def beam_step_reference(beam_keys, beam_packed, vecs, cand_ids, queries, *,
                        metric: int, window: int, m: int, decode=None):
    """Pure-XLA reference of the kernel math (for tests)."""
    return _beam_step_body(beam_keys, beam_packed, vecs, cand_ids, queries,
                           metric=metric, window=window, m=m, roll=jnp.roll,
                           decode=decode)
