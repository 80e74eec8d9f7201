"""Fused beam-update Pallas kernel for lockstep greedy search.

One kernel per search iteration consumes the scored candidates and performs
everything the reference's inner loop does *after* the distance computes
(``include/svs/index/vamana/greedy_search.h:124-203``: visited-filter check,
sorted-buffer insert, next-pop selection), entirely in VMEM:

1. duplicate masking — beam entries and candidates are sorted by id (bitonic,
   lane axis); duplicate runs are masked, beam copies (carrying the visited
   flag) win (the lockstep analog of the reference's ``VisitedFilter`` +
   sorted-insert dedup, ``filter.h:46``);
2. sorted merge — a second bitonic sort by key truncated to the beam
   capacity (``search_buffer.h`` sorted insert);
3. pop selection — the first ``m`` unvisited beam slots inside the search
   window are selected, marked visited, and their ids emitted for the next
   iteration's expansion (``search_buffer.h:39`` window/capacity split).

Run separately, these are 4-5 XLA ops whose HBM round-trips dominate the
serving iteration (PERF.md ablation: ~0.45 ms of a ~1.3 ms iteration at
B=2048); fused, the state never leaves VMEM.

The beam is carried *packed*: ``packed = id | visited << 30`` (ids < 2^30,
matching the search loop's packing convention).  Invalid slots hold key=+inf
and arbitrary packed bits; every consumer masks on key finiteness.

Mosaic notes: all masks are int32 0/1 (i1-vector arithmetic does not lower),
and the bitonic compare-exchange uses ``pltpu.roll`` XOR-shuffles instead of
lane reshapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VIS_BIT = 1 << 30
ID_MASK = VIS_BIT - 1
_INT_BIG = 2**31 - 1  # python int: jnp scalars become captured consts in pallas


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _partner(x: jax.Array, j: int, roll) -> jax.Array:
    """Value at lane index (i XOR j) along the last axis."""
    ax = x.ndim - 1
    n = x.shape[-1]
    fwd = roll(x, n - j, ax)   # out[i] = x[i + j]  (pltpu.roll: shift >= 0)
    bwd = roll(x, j, ax)       # out[i] = x[i - j]
    bit = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) & j) != 0
    return jnp.where(bit, bwd, fwd)


def bitonic_sort(keys: jax.Array, payloads, roll=jnp.roll):
    """Ascending bitonic sort along the last axis (power-of-2 length),
    carrying payload arrays.  Pure jnp — usable inside Pallas kernels
    (with ``pltpu.roll``) and in plain XLA for testing (``jnp.roll``)."""
    single = not isinstance(payloads, (tuple, list))
    if single:
        payloads = (payloads,)
    payloads = tuple(payloads)
    n = keys.shape[-1]
    assert n & (n - 1) == 0, f"bitonic length {n} not a power of 2"
    idx = jax.lax.broadcasted_iota(jnp.int32, keys.shape, keys.ndim - 1)
    k = 2
    while k <= n:
        lk = k.bit_length() - 1
        j = k // 2
        while j >= 1:
            lj = j.bit_length() - 1
            # take_min = ascending XOR high-half = (kbit == jbit); one integer
            # compare — Mosaic rejects i1-vector arithmetic
            take_min = ((idx >> lk) & 1) == ((idx >> lj) & 1)
            pk = _partner(keys, j, roll)
            new_keys = jnp.where(take_min, jnp.minimum(keys, pk),
                                 jnp.maximum(keys, pk))
            # payloads follow whenever the key changed (ties keep their own)
            moved = new_keys != keys
            payloads = tuple(
                jnp.where(moved, _partner(p, j, roll), p) for p in payloads)
            keys = new_keys
            j //= 2
        k *= 2
    if single:
        return keys, payloads[0]
    return keys, payloads


def _beam_update_body(beam_keys, beam_packed, cand_keys, cand_ids,
                      *, window: int, m: int, roll):
    """Shared math for the kernel and its XLA reference path."""
    bb, c = beam_keys.shape
    k = cand_keys.shape[1]
    el = c + k
    lp = _next_pow2(el)
    one = jnp.int32(1)
    zero = jnp.int32(0)

    # --- sort 1: by id (beam copy first), mask duplicate runs ---------------
    # sortid = id*2 + is_candidate; invalid entries sort to the end.
    beam_valid = jnp.where(jnp.isfinite(beam_keys), one, zero)
    cand_valid = jnp.where((cand_ids >= 0)
                           & jnp.isfinite(cand_keys), one, zero)
    beam_sortid = jnp.where(beam_valid == 1,
                            (beam_packed & ID_MASK) * 2, _INT_BIG)
    cand_sortid = jnp.where(cand_valid == 1, cand_ids * 2 + 1, _INT_BIG)
    pad = lp - el
    # zero-width operands don't lower in Mosaic (vector sizes must be > 0)
    tail_i = [jnp.full((bb, pad), _INT_BIG, jnp.int32)] if pad else []
    tail_f = [jnp.full((bb, pad), jnp.inf, jnp.float32)] if pad else []
    tail_n = [jnp.full((bb, pad), -1, jnp.int32)] if pad else []
    sortid = jnp.concatenate([beam_sortid, cand_sortid] + tail_i, axis=1)
    keys = jnp.concatenate([beam_keys, cand_keys] + tail_f, axis=1)
    packed = jnp.concatenate([beam_packed, cand_ids] + tail_n, axis=1)
    sortid, (keys, packed) = bitonic_sort(sortid, (keys, packed), roll=roll)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bb, lp), 1)
    prev = roll(sortid, 1, 1)
    live = jnp.where(sortid != _INT_BIG, one, zero)
    dup = (jnp.where(iota > 0, one, zero)
           * jnp.where((sortid >> 1) == (prev >> 1), one, zero)
           * live)
    keys = jnp.where(dup == 1, jnp.inf, keys)

    # candidate survivors (for build pool tracking): any order, inf-masked
    is_cand = (sortid & 1) * live * (1 - dup)
    pool_cand_keys = jnp.where(is_cand == 1, keys, jnp.inf)[:, :el]
    pool_cand_ids = jnp.where(is_cand == 1, sortid >> 1, -1)[:, :el]

    # --- sort 2: by key, truncate to capacity -------------------------------
    keys, packed = bitonic_sort(keys, packed, roll=roll)
    new_keys = keys[:, :c]
    new_packed = packed[:, :c]

    # --- pop selection ------------------------------------------------------
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
    return new_keys, new_packed, popped, pool_cand_keys, pool_cand_ids


def _kernel(beam_keys_ref, beam_packed_ref, cand_keys_ref, cand_ids_ref,
            out_keys_ref, out_packed_ref, popped_ref, pool_keys_ref,
            pool_ids_ref, *, window, m):
    new_keys, new_packed, popped, pck, pci = _beam_update_body(
        beam_keys_ref[:], beam_packed_ref[:], cand_keys_ref[:],
        cand_ids_ref[:], window=window, m=m, roll=pltpu.roll)
    out_keys_ref[:] = new_keys
    out_packed_ref[:] = new_packed
    popped_ref[:] = popped
    pool_keys_ref[:] = pck
    pool_ids_ref[:] = pci


@partial(jax.jit, static_argnames=("window", "m", "block_rows", "interpret"))
def beam_update(beam_keys: jax.Array, beam_packed: jax.Array,
                cand_keys: jax.Array, cand_ids: jax.Array, *,
                window: int, m: int, block_rows: int = 128,
                interpret: bool = False):
    """Merge scored candidates into the beam and pop the next ``m`` nodes.

    Args:
      beam_keys: (B, C) f32 sorted ascending, +inf = empty slot.
      beam_packed: (B, C) int32, ``id | visited << 30``.
      cand_keys: (B, K) f32 candidate keys, +inf = invalid.
      cand_ids: (B, K) int32 candidate ids, -1 = invalid.
      window: pop horizon (first ``window`` beam slots).
      m: pop width.

    Returns:
      (new_keys (B, C), new_packed (B, C), popped (B, m) int32 with -1
      where no unvisited candidate remained, pool_cand_keys (B, C+K),
      pool_cand_ids (B, C+K)) — the last two are the deduplicated surviving
      candidates in arbitrary order (+inf/-1 where masked), for build pool
      tracking.
    """
    b, c = beam_keys.shape
    k = cand_keys.shape[1]
    el = c + k
    # pad the row count to a multiple of the block size — a single giant
    # block would blow VMEM, and callers pass arbitrary batch sizes
    bb = min(block_rows, max(8, b))
    pad_rows = (-b) % bb
    if pad_rows:
        beam_keys = jnp.pad(beam_keys, ((0, pad_rows), (0, 0)),
                            constant_values=jnp.inf)
        beam_packed = jnp.pad(beam_packed, ((0, pad_rows), (0, 0)),
                              constant_values=-1)
        cand_keys = jnp.pad(cand_keys, ((0, pad_rows), (0, 0)),
                            constant_values=jnp.inf)
        cand_ids = jnp.pad(cand_ids, ((0, pad_rows), (0, 0)),
                           constant_values=-1)
    bp = b + pad_rows
    grid = (bp // bb,)
    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (bb, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, window=window, m=m),
        grid=grid,
        in_specs=[row_spec(c), row_spec(c), row_spec(k), row_spec(k)],
        out_specs=[row_spec(c), row_spec(c), row_spec(m), row_spec(el),
                   row_spec(el)],
        out_shape=[
            jax.ShapeDtypeStruct((bp, c), jnp.float32),
            jax.ShapeDtypeStruct((bp, c), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, el), jnp.float32),
            jax.ShapeDtypeStruct((bp, el), jnp.int32),
        ],
        interpret=interpret,
    )(beam_keys, beam_packed, cand_keys, cand_ids)
    if pad_rows:
        out = [o[:b] for o in out]
    return out


def beam_update_reference(beam_keys, beam_packed, cand_keys, cand_ids, *,
                          window: int, m: int):
    """Pure-XLA reference of the kernel math (for tests)."""
    return _beam_update_body(beam_keys, beam_packed, cand_keys, cand_ids,
                             window=window, m=m, roll=jnp.roll)
