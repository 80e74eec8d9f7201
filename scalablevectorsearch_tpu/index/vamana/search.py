"""Lockstep batched greedy graph search.

TPU-native re-formulation of the reference's greedy best-first traversal
(``include/svs/index/vamana/greedy_search.h:124-203``) and sorted search
buffer (``search_buffer.h``).  The reference walks one query at a time with a
per-query sorted candidate list, prefetch-pipelined scalar distance loops, and
an optional visited filter.  Here, a whole batch of queries advances in
lockstep:

* the search buffer is a dense ``(B, C)`` beam (ids / keys / visited flags)
  kept sorted ascending by key — the sorted-insert becomes a batched
  sort-merge of ``(B, C + R)`` each iteration;
* "pop nearest unvisited within the window" is an ``argmax`` over a boolean
  mask (the beam is sorted, so the first unvisited position is the best);
* the adjacency fetch + distance loop becomes one HBM row-gather plus a
  batched matvec on the VPU (``ops.distance.gathered_keys``);
* per-query termination is a done-flag; finished queries no-op until the
  whole batch converges (``lax.while_loop``), bounded by ``max_iters``.

The buffer's window/capacity split matches the reference's
``SearchBufferConfig`` (search_buffer.h:39): expansion candidates are popped
only from the first ``window`` beam slots, but up to ``capacity`` candidates
are retained for reranking-style use.

Build-mode history capture (``track_pool=True``) maintains a running
merge-truncated top-P pool of every candidate scored during the search —
semantically identical to the reference's full search-history tracker whose
pool is sorted and resized to ``max_candidate_pool_size`` afterwards
(``vamana_build.h:409-446``).
"""

from __future__ import annotations

import dataclasses
import os as _os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.data import VectorDataset
from ...core.graph import NeighborGraph
from ...ops import distance as dist_ops
from ...ops import topk as topk_ops

# Default multi-pop width for serving searches.  Callers sizing exact
# visited-filter rings must use this same constant (ring capacity =
# pop_width * max_iters holds every expansion the bounded loop can make).
SERVING_POP_WIDTH = 4


@partial(jax.tree_util.register_dataclass,
         data_fields=["ids", "keys", "n_iters", "n_pops", "pool_ids",
                      "pool_keys"],
         meta_fields=[])
@dataclasses.dataclass
class SearchOutput:
    """Beam contents (sorted ascending) + optional build pool per query.

    ``n_pops`` is the per-query expansion count — the lockstep analog of the
    reference's ``SearchTracker`` distance-computation counters
    (search_tracker.h:29; distance computes = n_pops * R)."""

    ids: jax.Array        # (B, C) int32, -1 where invalid
    keys: jax.Array       # (B, C) f32, +inf where invalid
    n_iters: jax.Array    # () int32: lockstep iterations executed
    n_pops: jax.Array     # (B,) int32: expansions per query
    pool_ids: jax.Array   # (B, P) int32 or (B, 0) when not tracked
    pool_keys: jax.Array  # (B, P) f32


def _compact_tail_phase(state, queries, b2, make_cond, make_body, active_of):
    """Finish a lockstep search on a compacted straggler slice.

    ``state`` is ``(it, *row_arrays)`` where every array after the iteration
    counter is row-indexed by query.  Unconverged queries (``active_of``)
    are permuted to a dense prefix, the loop continues on the first ``b2``
    rows only (per-iteration cost — dominated by the HBM row gather — is
    linear in rows), and the finished rows are scattered back in order.
    """
    it0, *rows_state = state
    active = active_of(state)
    order = jnp.argsort(~active)          # stable: active rows first
    inv = jnp.argsort(order)
    perm = [x[order] for x in rows_state]
    sub = tuple(x[:b2] for x in perm)
    q_sub = queries[order][:b2]
    sub_state = jax.lax.while_loop(make_cond(0), make_body(q_sub),
                                   (it0,) + sub)
    it1, *sub_rows = sub_state
    merged = [jnp.concatenate([s, px[b2:]], axis=0)[inv]
              for s, px in zip(sub_rows, perm)]
    return (it1, *merged)


@partial(jax.jit, static_argnames=(
    "window", "capacity", "max_iters", "distance", "pool_size", "pop_width",
    "tail_frac", "visited_size"))
def greedy_search(graph: NeighborGraph,
                  data: VectorDataset,
                  queries: jax.Array,
                  entry_ids: jax.Array,
                  *,
                  window: int,
                  capacity: int,
                  max_iters: int,
                  distance: dist_ops.DistanceType,
                  pool_size: int = 0,
                  pop_width: int = SERVING_POP_WIDTH,
                  packed: Optional[jax.Array] = None,
                  tail_frac: int = 1,
                  visited_size: int = 0) -> SearchOutput:
    """Run lockstep greedy search for a batch of queries.

    Args:
      queries: (B, d_pad) device array (query dtype is respected; distance
        accumulates in f32).
      entry_ids: (E,) or (B, E) int32 entry points (seeded into the beam,
        reference ``EntryPointInitializer`` greedy_search.h:62-94).
      window: pop horizon (``search_window_size``).
      capacity: beam size (``search_buffer_capacity``); >= window.
      max_iters: static iteration bound (each iteration pops one candidate
        per query).
      pool_size: if > 0, track the running top-``pool_size`` of all scored
        candidates (build mode).
      pop_width: number of beam entries expanded per lockstep iteration
        (multi-pop).  1 reproduces the reference's strictly-best-first order;
        larger values trade a slightly eager expansion order for ~pop_width x
        fewer sequential iterations — on TPU the per-iteration cost is
        latency-bound, so this is nearly a pure win (recall impact is
        validated to be negligible-to-positive in tests/benchmarks).
      packed: optional (capacity, R, d) packed-neighborhood array
        (``packed.pack_neighborhoods``): candidate vectors are read from the
        popped nodes' inline neighborhoods (m super-row gathers instead of
        m*R row gathers — the HBM gather is per-row limited, PERF.md).  When
        the packed dtype is lossy (bf16), the final beam is re-scored
        against the exact rows.
      tail_frac: lockstep tail compaction.  1 = off (single full-batch
        loop).  For tail_frac = F > 1, the full-batch loop runs only until
        <= B/F queries remain unconverged; those stragglers are then
        permuted into a dense prefix and the loop continues on the B/F-row
        slice — per-iteration cost (the HBM row gather) is linear in rows,
        so the batch stops paying full price for its slowest queries.  The
        reference has no analog (its per-query threads finish
        independently); this recovers that property for lockstep batches.
      visited_size: cross-iteration visited filter (the lockstep analog of
        the reference's opt-in ``VisitedFilter``, vamana/filter.h:46).
        0 = off: the beam's visited flags + dedup masks bound revisits in
        practice, but a node evicted from the beam and re-encountered later
        can re-expand.  > 0 = keep a per-query ring of the last
        ``visited_size`` popped ids and drop candidates already in it —
        bounded memory, exact for searches with <= visited_size pops.
        Rounded up to a multiple of ``pop_width``.

    Returns: SearchOutput with beams sorted ascending by key.
    """
    distance = dist_ops.as_distance(distance)
    b = queries.shape[0]
    c = capacity
    r = graph.max_degree
    if window > capacity:
        raise ValueError(f"window {window} > capacity {capacity}")

    if entry_ids.ndim == 1:
        entry_ids = jnp.broadcast_to(entry_ids[None, :],
                                     (b, entry_ids.shape[0]))
    e = entry_ids.shape[1]

    q_norms = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)

    # Sharded dataset views provide their own collective scoring path
    # (parallel/sharded.py: local gather + pmin over the shard axis)
    custom_score = getattr(data, "score_keys", None)

    def score(ids: jax.Array) -> jax.Array:
        """(B, K) ids -> (B, K) keys with +inf for invalid ids.

        Candidate norms are recomputed from the gathered rows rather than
        gathered from the norm cache — one fused reduction replaces a
        second HBM gather op."""
        if custom_score is not None:
            return custom_score(distance, queries, q_norms, ids)
        clamped = jnp.maximum(ids, 0)
        vecs = data.get(clamped)
        keys = dist_ops.gathered_keys(distance, queries, vecs,
                                      query_norms_sq=q_norms)
        in_range = (ids >= 0) & (ids < data.n)
        return jnp.where(in_range, keys, jnp.inf)

    # ---- seed beam with entry points -------------------------------------
    entry_keys = score(entry_ids)
    entry_keys = topk_ops.mask_first_duplicates(entry_keys, entry_ids)
    pad = c - e
    beam_ids = jnp.concatenate(
        [entry_ids.astype(jnp.int32),
         jnp.full((b, pad), -1, jnp.int32)], axis=1) if pad >= 0 else \
        entry_ids[:, :c].astype(jnp.int32)
    beam_keys = jnp.concatenate(
        [entry_keys, jnp.full((b, pad), jnp.inf, jnp.float32)], axis=1) \
        if pad >= 0 else entry_keys[:, :c]
    beam_keys, beam_ids = topk_ops.sort_by_key(beam_keys, beam_ids)
    beam_vis = jnp.zeros((b, c), dtype=jnp.int32)
    # ids are packed with the visited flag in bit 30 during the merge sort
    # (one sort operand instead of two); graph ids must stay below 2^30.
    VIS_BIT = jnp.int32(1 << 30)

    track = pool_size > 0
    p = pool_size if track else 0
    pool_ids0 = jnp.full((b, max(p, 1)), -1, jnp.int32)[:, :p]
    pool_keys0 = jnp.full((b, max(p, 1)), jnp.inf, jnp.float32)[:, :p]
    if track:
        pool_keys0, pool_ids0 = topk_ops.merge_smallest(
            pool_keys0, pool_ids0, entry_keys, entry_ids.astype(jnp.int32), p)

    iota_c = jnp.arange(c, dtype=jnp.int32)
    window_mask = (iota_c < window)[None, :]
    m = pop_width
    # cross-iteration visited ring (multiple of m so each iteration writes
    # one contiguous m-block and wrap-around stays aligned)
    v = -(-visited_size // m) * m if visited_size > 0 else 0
    ring0 = jnp.full((b, max(v, 1)), -1, jnp.int32)[:, :v]

    # Fully-fused beam-step Pallas kernel (TPU only): candidate scoring +
    # dedup + bitonic merge + pop selection in one VMEM-resident kernel —
    # the gathered candidate rows are consumed exactly once (PERF.md round-2
    # lever 1; the XLA lowering materializes the (B, K, d) score
    # intermediates).  Plain f32/bf16 datasets only: quantized/sharded
    # datasets bring their own scoring.
    # SVT_FORCE_BEAM_KERNEL=1 runs the kernel path in interpret mode off-TPU
    # (test hook; env is read at trace time like the other SVT_* knobs).
    force_kernel = _os.environ.get("SVT_FORCE_BEAM_KERNEL")
    from ...quantization.lvq import LVQDataset
    # Fused LVQ-8 decode+score kernel (beam_step_lvq): exact and tested,
    # but measured SLOWER than the XLA whole-iteration path on real TPU
    # (10.0k vs 12.6k QPS at 100k/w32, identical recall) — XLA fuses the
    # affine decode into the score chain on its own, so the in-VMEM decode
    # only adds work. Opt-in via SVT_LVQ_KERNEL=1 (PERF.md dead ends);
    # 4-bit primaries always use the XLA path (nibble unpack interleaves
    # lanes, and the measured TPU Pareto puts LVQ8 ahead of every 4-bit
    # kind anyway — PERF.md equal-memory table).
    lvq_mode = (isinstance(data, LVQDataset) and data.bits == 8
                and (_os.environ.get("SVT_LVQ_KERNEL") or force_kernel))
    from .packed import PackedLVQNeighborhoods
    packed_lvq = isinstance(packed, PackedLVQNeighborhoods)
    if packed_lvq:
        lvq_mode = False      # super-row decode replaces per-row LVQ gathers
    # huge retained capacities (k approaching n) blow the kernel's scoped
    # VMEM (measured: capacity 5000 at block 8 needs 16.8M vs the 16M
    # limit) — serving/build capacities are <= a few hundred, so the
    # fallback only triggers for enumeration-style requests, where the
    # XLA path's HBM-resident beam is the right tool anyway
    kernel_ok = (jax.default_backend() == "tpu" or force_kernel) \
        and not _os.environ.get("SVT_NO_BEAM_KERNEL") \
        and custom_score is None and capacity <= 1024
    use_beam_kernel = kernel_ok and (
        lvq_mode or packed_lvq
        or (isinstance(data, VectorDataset)
            and data.dtype in (jnp.float32, jnp.bfloat16)))
    if use_beam_kernel:
        from ...ops.pallas.beam_step import beam_step, beam_step_lvq

        metric_code = {dist_ops.DistanceType.L2: 0,
                       dist_ops.DistanceType.MIP: 1}.get(distance, 2)
        n_data = data.n
        if queries.dtype not in (jnp.float32, jnp.bfloat16):
            queries = queries.astype(jnp.float32)
        if lvq_mode:
            lvq_mean = data.mean[None, :]
            n_dead = data.padded_dim - data.dim
            queries = queries.astype(jnp.float32)
        # initial pop: beam is sorted and fully unvisited — take the first m
        # finite in-window slots and mark them visited
        in_win0 = (iota_c[None, :] < min(m, window)) & jnp.isfinite(beam_keys)
        popped = jnp.where(in_win0[:, :m], beam_ids[:, :m], -1)
        beam_packed = jnp.where(
            jnp.isfinite(beam_keys),
            beam_ids + jnp.where(in_win0, VIS_BIT, 0), -1)

        def make_cond(thresh):
            def cond_k(state):
                it, bk, bp, popped, n_pops, pool_ids, pool_keys, ring = state
                n_active = jnp.sum(jnp.any(popped >= 0, axis=1))
                return jnp.logical_and(it < max_iters, n_active > thresh)
            return cond_k

        def make_body(q_rows):
            rows = q_rows.shape[0]

            def body_k(state):
                it, bk, bp, popped, n_pops, pool_ids, pool_keys, ring = state
                has = popped >= 0                           # (rows, m)
                n_pops = n_pops + jnp.sum(has, axis=1, dtype=jnp.int32)
                popped_flat = jnp.maximum(popped, 0).reshape(-1)
                nbrs = graph.neighbors(popped_flat)
                nbrs = nbrs.reshape(rows, m * r)
                nbrs = jnp.where(jnp.repeat(has, r, axis=1), nbrs, -1)
                nbrs = jnp.where(nbrs < n_data, nbrs, -1)
                if v:
                    # visited-ring filter: record this iteration's pops,
                    # drop candidates popped within the last v expansions
                    ring = jax.lax.dynamic_update_slice(
                        ring, jnp.where(has, popped, -1),
                        (jnp.int32(0), (it * m) % v))
                    seen = jnp.any(nbrs[:, :, None] == ring[:, None, :],
                                   axis=-1)
                    nbrs = jnp.where(seen, -1, nbrs)
                interp = bool(force_kernel
                              and jax.default_backend() != "tpu")
                if lvq_mode:
                    # fused decode+score: gather int8 code rows + per-row
                    # (scale, bias); reconstruction happens in-kernel
                    cl = jnp.maximum(nbrs, 0)
                    codes = jnp.take(data.codes, cl, axis=0, mode="clip")
                    sc = jnp.take(data.scales, cl, axis=0, mode="clip")
                    bi = jnp.take(data.biases, cl, axis=0, mode="clip")
                    bk, bp, popped, cand_keys, cand_ids = beam_step_lvq(
                        bk, bp, codes, sc, bi, lvq_mean, nbrs, q_rows,
                        metric=metric_code, window=window, m=m,
                        n_dead=n_dead, interpret=interp)
                else:
                    if packed_lvq:
                        # m super-row CODE gathers/query (int8: 1/4 the
                        # bf16 packed bytes); exact f32 primary decode
                        # fuses into the kernel-input write
                        vecs = packed.decode(popped_flat, rows)
                    elif packed is not None:
                        # m super-row gathers/query instead of m*r row
                        # gathers; rows of masked ids are garbage, masked
                        # by id in-kernel
                        vecs = jnp.take(packed, popped_flat, axis=0,
                                        mode="clip")
                        vecs = vecs.reshape(rows, m * r, packed.shape[2])
                    else:
                        vecs = data.get(jnp.maximum(nbrs, 0))
                    bk, bp, popped, cand_keys, cand_ids = beam_step(
                        bk, bp, vecs, nbrs, q_rows, metric=metric_code,
                        window=window, m=m, interpret=interp)
                if track:
                    # mask candidates already pooled: hub nodes are re-scored
                    # every time they appear in another expansion, and their
                    # copies would crowd the pool down to a handful of unique
                    # ids (catastrophic for MIP graphs, which are hub-heavy —
                    # measured pool uniqueness ~14/250 without this mask)
                    cand_keys = topk_ops.mask_duplicate_ids(
                        cand_keys, cand_ids, pool_ids)
                    pool_keys, pool_ids = topk_ops.merge_smallest(
                        pool_keys, pool_ids, cand_keys, cand_ids, p)
                return (it + 1, bk, bp, popped, n_pops, pool_ids, pool_keys,
                        ring)
            return body_k

        state = (jnp.int32(0), beam_keys, beam_packed, popped,
                 jnp.zeros((b,), jnp.int32), pool_ids0, pool_keys0, ring0)
        b2 = b // tail_frac if tail_frac > 1 else 0
        compact_tail = tail_frac > 1 and b2 >= 8
        state = jax.lax.while_loop(make_cond(b2 if compact_tail else 0),
                                   make_body(queries), state)
        if compact_tail:
            state = _compact_tail_phase(
                state, queries, b2, make_cond, make_body,
                active_of=lambda s: jnp.any(s[3] >= 0, axis=1))
        it, beam_keys, beam_packed, popped, n_pops, pool_ids, pool_keys, \
            _ring = state
        beam_ids = jnp.where(jnp.isfinite(beam_keys),
                             beam_packed & (VIS_BIT - 1), -1)
        if packed is not None and packed.dtype != data.dtype:
            # lossy packed traversal: re-score the final beam against the
            # exact rows (one C-row gather per query) and re-sort
            beam_keys = score(beam_ids)
            beam_keys, beam_ids = topk_ops.sort_by_key(beam_keys, beam_ids)
            beam_ids = jnp.where(jnp.isfinite(beam_keys), beam_ids, -1)
        return SearchOutput(ids=beam_ids, keys=beam_keys, n_iters=it,
                            n_pops=n_pops, pool_ids=pool_ids,
                            pool_keys=pool_keys)

    def unvisited_mask(keys, vis):
        return jnp.isfinite(keys) & (vis == 0) & window_mask

    def make_cond(thresh):
        def cond(state):
            it, beam_ids, beam_keys, beam_vis, n_pops, pool_ids, \
                pool_keys, ring = state
            n_active = jnp.sum(
                jnp.any(unvisited_mask(beam_keys, beam_vis), axis=1))
            return jnp.logical_and(it < max_iters, n_active > thresh)
        return cond

    big = jnp.int32(c + 1)

    def make_body(q_rows):
        rows = q_rows.shape[0]
        q_norms_rows = jnp.sum(q_rows.astype(jnp.float32) ** 2, axis=-1)

        def score_rows(ids):
            if custom_score is not None:
                return custom_score(distance, q_rows, q_norms_rows, ids)
            clamped = jnp.maximum(ids, 0)
            vecs = data.get(clamped)
            keys = dist_ops.gathered_keys(distance, q_rows, vecs,
                                          query_norms_sq=q_norms_rows)
            in_range = (ids >= 0) & (ids < data.n)
            return jnp.where(in_range, keys, jnp.inf)

        def body(state):
            it, beam_ids, beam_keys, beam_vis, n_pops, pool_ids, \
                pool_keys, ring = state
            unvis = unvisited_mask(beam_keys, beam_vis)
            # first m unvisited positions (beam sorted => best m)
            pos_score = jnp.where(unvis, iota_c[None, :], big)
            neg, _ = jax.lax.top_k(-pos_score, m)          # (rows, m)
            pos = -neg
            has = pos < big                                # (rows, m) valid
            pos_c = jnp.minimum(pos, c - 1)
            popped = jnp.take_along_axis(beam_ids, pos_c, axis=1)

            # mark popped visited
            hit = jnp.any((iota_c[None, None, :] == pos_c[:, :, None])
                          & has[:, :, None], axis=1)
            beam_vis = jnp.where(hit, 1, beam_vis)
            n_pops = n_pops + jnp.sum(has, axis=1, dtype=jnp.int32)

            # expand: adjacency gather + candidate scoring, m rows per query
            popped_flat = jnp.maximum(popped, 0).reshape(-1)
            nbrs = graph.neighbors(popped_flat)
            nbrs = nbrs.reshape(rows, m * r)
            nbrs = jnp.where(jnp.repeat(has, r, axis=1), nbrs, -1)
            if v:
                # visited-ring filter: record this iteration's pops, drop
                # candidates popped within the last v expansions
                ring = jax.lax.dynamic_update_slice(
                    ring, jnp.where(has, popped, -1),
                    (jnp.int32(0), (it * m) % v))
                seen = jnp.any(nbrs[:, :, None] == ring[:, None, :],
                               axis=-1)
                nbrs = jnp.where(seen, -1, nbrs)
            if packed_lvq:
                # super-row code gathers + exact f32 primary decode (XLA
                # fuses the affine decode into the score chain)
                vecs = packed.decode(popped_flat, rows)
                cand_keys = dist_ops.gathered_keys(
                    distance, q_rows, vecs, query_norms_sq=q_norms_rows)
                cand_keys = jnp.where((nbrs >= 0) & (nbrs < data.n),
                                      cand_keys, jnp.inf)
            elif packed is not None:
                vecs = jnp.take(packed, popped_flat, axis=0, mode="clip")
                vecs = vecs.reshape(rows, m * r, packed.shape[2])
                cand_keys = dist_ops.gathered_keys(
                    distance, q_rows, vecs, query_norms_sq=q_norms_rows)
                cand_keys = jnp.where((nbrs >= 0) & (nbrs < data.n),
                                      cand_keys, jnp.inf)
            else:
                cand_keys = score_rows(nbrs)
            cand_keys = topk_ops.mask_first_duplicates(cand_keys, nbrs)

            if track:
                # mask candidates already pooled: without this, hub nodes
                # re-scored across iterations fill the pool with duplicate
                # copies and collapse its unique-candidate count (see the
                # kernel path above; ~14/250 unique measured on MIP graphs)
                pool_cand_keys = topk_ops.mask_duplicate_ids(
                    cand_keys, nbrs, pool_ids)
                pool_keys, pool_ids = topk_ops.merge_smallest(
                    pool_keys, pool_ids, pool_cand_keys, nbrs, p)

            # beam dedup + sort-merge insert (ids packed with visited flag)
            cand_keys = topk_ops.mask_duplicate_ids(cand_keys, nbrs,
                                                    beam_ids)
            all_keys = jnp.concatenate([beam_keys, cand_keys], axis=1)
            packed_rows = jnp.concatenate(
                [beam_ids + beam_vis * VIS_BIT, nbrs], axis=1)
            s_keys, s_packed = jax.lax.sort(
                (all_keys, packed_rows), dimension=-1, num_keys=1)
            keep = jnp.any(has, axis=1)[:, None]
            new_packed = s_packed[:, :c]
            # invalid (-1) entries unpack to garbage, but their keys stay
            # +inf so every consumer masks them; final extraction restores
            # -1.
            beam_ids = jnp.where(keep, new_packed & (VIS_BIT - 1), beam_ids)
            beam_vis = jnp.where(keep, new_packed >> 30, beam_vis)
            beam_keys = jnp.where(keep, s_keys[:, :c], beam_keys)
            return (it + 1, beam_ids, beam_keys, beam_vis, n_pops,
                    pool_ids, pool_keys, ring)
        return body

    state = (jnp.int32(0), beam_ids, beam_keys, beam_vis,
             jnp.zeros((b,), jnp.int32), pool_ids0, pool_keys0, ring0)
    b2 = b // tail_frac if tail_frac > 1 else 0
    compact_tail = tail_frac > 1 and b2 >= 8
    state = jax.lax.while_loop(make_cond(b2 if compact_tail else 0),
                               make_body(queries), state)
    if compact_tail:
        state = _compact_tail_phase(
            state, queries, b2, make_cond, make_body,
            active_of=lambda s: jnp.any(unvisited_mask(s[2], s[3]), axis=1))
    it, beam_ids, beam_keys, beam_vis, n_pops, pool_ids, pool_keys, \
        _ring = state

    beam_ids = jnp.where(jnp.isfinite(beam_keys), beam_ids, -1)
    if packed is not None and packed.dtype != data.dtype:
        beam_keys = score(beam_ids)
        beam_keys, beam_ids = topk_ops.sort_by_key(beam_keys, beam_ids)
        beam_ids = jnp.where(jnp.isfinite(beam_keys), beam_ids, -1)
    return SearchOutput(ids=beam_ids, keys=beam_keys, n_iters=it,
                        n_pops=n_pops, pool_ids=pool_ids,
                        pool_keys=pool_keys)


def default_max_iters(window: int) -> int:
    """Iteration bound: each pop visits one window slot; re-expansions and
    evictions add slack.  2W + 16 empirically never truncates convergent
    searches (the reference loops until the window is fully visited)."""
    return 2 * window + 16
