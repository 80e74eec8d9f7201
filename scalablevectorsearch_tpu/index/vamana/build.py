"""Batched synchronous Vamana graph construction.

TPU-native re-formulation of the reference's ``VamanaBuilder``
(``include/svs/index/vamana/vamana_build.h``).  The reference's build is
already batch-synchronous (two-phase read-then-commit per batch, SURVEY §3.1);
this implementation keeps that structure exactly but replaces its threads +
locks machinery with whole-batch compiled steps:

  construct(pass_alpha) over batches (vamana_build.h:221-318):
    1. generate_neighbors (vamana_build.h:327-478): lockstep greedy search for
       every node in the batch over the *round-start* graph, pool = running
       top-P of all scored candidates (== sorted/truncated full search
       history) ∪ current adjacency, then batched RobustPrune with the
       *build* alpha (the reference purposely passes params.alpha here, see
       comment at vamana_build.h:271) and whole-row commit.
    2. add_reverse_edges (vamana_build.h:483-579): the per-vertex
       lock/append/overflow dance becomes sort-by-destination + segment
       ranking: the first (R - degree) backedges per destination are scattered
       in place; overflowing destinations are re-pruned to ``prune_to`` with
       the *pass* alpha over {current adjacency ∪ overflow backedges}.

  Two passes over all batches with pass alphas 1.0 then params.alpha
  (index.h:428-431).

Nondeterminism note: the reference is nondeterministic under threading; this
implementation is deterministic for a fixed batch size.  Recall parity is
validated statistically, not bit-exactly (SURVEY §7 hard part 2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.data import VectorDataset
from ...core.graph import NeighborGraph
from ...core.medioid import compute_medioid
from ...lib import logging as svs_logging
from ...lib import timing
from ...ops import distance as dist_ops
from ...ops import prune as prune_ops
from ...ops import topk as topk_ops
from . import search as search_mod
from .params import VamanaBuildParameters

_INT_MAX = jnp.int32(2 ** 31 - 1)
MAX_BACKEDGES = 16   # per-destination reverse-edge overflow cap per round


def _score_against(data: VectorDataset, distance, queries, q_norms, ids):
    """Keys from each query row to its gathered candidate ids (+inf invalid)."""
    custom = getattr(data, "score_keys", None)
    if custom is not None:     # sharded view: local score + pmin collective
        return custom(distance, queries, q_norms, ids)
    clamped = jnp.maximum(ids, 0)
    vecs = data.get(clamped)
    norms = data.norms_of(clamped)
    keys = dist_ops.gathered_keys(distance, queries, vecs,
                                  gathered_norms_sq=norms,
                                  query_norms_sq=q_norms)
    return jnp.where((ids >= 0) & (ids < data.n), keys, jnp.inf)


def _prune_pools(data: VectorDataset, pool_ids, pool_keys, self_ids,
                 alpha: float, max_result: int, distance, chunk: int):
    """Chunked batched RobustPrune: gathers pool vectors per chunk to bound
    the (chunk, P, P) pairwise matrix in memory."""
    b, p = pool_ids.shape
    n_chunks = -(-b // chunk)
    pad = n_chunks * chunk - b
    if pad:
        pool_ids = jnp.pad(pool_ids, ((0, pad), (0, 0)), constant_values=-1)
        pool_keys = jnp.pad(pool_keys, ((0, pad), (0, 0)),
                            constant_values=jnp.inf)
        self_ids = jnp.pad(self_ids, (0, pad), constant_values=-1)

    def one_chunk(args):
        ids, keys, selfs = args
        clamped = jnp.maximum(ids, 0)
        vecs = data.get(clamped).astype(jnp.float32)
        norms = data.norms_of(clamped)
        norms = jnp.where(ids >= 0, norms, jnp.inf)
        return prune_ops.robust_prune(ids, keys, vecs, norms, selfs,
                                      alpha, max_result, distance)

    rows, degs = jax.lax.map(one_chunk, (
        pool_ids.reshape(n_chunks, chunk, p),
        pool_keys.reshape(n_chunks, chunk, p),
        self_ids.reshape(n_chunks, chunk)))
    rows = rows.reshape(n_chunks * chunk, -1)[:b]
    degs = degs.reshape(-1)[:b]
    return rows, degs


@partial(jax.jit, static_argnames=(
    "window", "capacity", "max_iters", "distance", "pool_size",
    "prune_to", "max_degree", "prune_chunk",
    "pop_width", "prune_pool", "tail_frac"))
def build_round(graph: NeighborGraph,
                data: VectorDataset,
                batch_ids: jax.Array,
                batch_valid: jax.Array,
                entry_ids: jax.Array,
                sampler=None,
                sample_invalid: Optional[jax.Array] = None,
                *,
                window: int, capacity: int, max_iters: int,
                distance: dist_ops.DistanceType, pool_size: int,
                gen_alpha: float, rev_alpha: float, prune_to: int,
                max_degree: int, prune_chunk: int, pop_width: int = 4,
                prune_pool: int = 0, tail_frac: int = 1):
    """One fully-fused synchronous build round over a batch of nodes:
    search -> prune -> commit -> reverse-edge append -> on-device overflow
    grouping -> reprune.  A single jit call with no host synchronization, so
    consecutive rounds pipeline through the dispatch queue.

    Returns (graph, dropped_backedges) where ``dropped_backedges`` counts
    overflow backedges beyond the static per-round capacities (rare; a
    quality-diagnostic only — the reference's BackedgeBuffer is unbounded).

    ``gen_alpha`` / ``rev_alpha`` are TRACED (not static): the two build
    passes differ only in the reverse-edge alpha, so keeping the alphas
    dynamic lets every round of both passes reuse ONE compiled executable —
    the dominant wall-time term at 1M through the remote compile service.
    """
    r = max_degree
    b = batch_ids.shape[0]
    queries = data.get(batch_ids)
    q_norms = data.norms_of(batch_ids)

    if sampler is not None:
        # per-node sampled entries (entry.py): start each node's build
        # search inside its own region instead of walking from the
        # medioid — same lever as serving, applied to the ~2(n/b) build
        # rounds.  ``sample_invalid`` masks sample rows not yet inserted
        # (pass 1 inserts in id order, so their adjacency is still
        # empty); when nothing is valid yet (round 0) fall back to the
        # provided entry so ONE executable covers every round.
        sel = sampler.select(distance, queries, invalid=sample_invalid)
        has_valid = jnp.any((sampler.ids >= 0) &
                            ~(sample_invalid if sample_invalid is not None
                              else jnp.zeros_like(sampler.ids, bool)))
        fallback = jnp.broadcast_to(entry_ids[:1][None, :], sel.shape)
        entry_ids = jnp.where(has_valid, sel, fallback.astype(sel.dtype))

    # --- 1. search with pool tracking -----------------------------------
    out = search_mod.greedy_search(
        graph, data, queries, entry_ids,
        window=window, capacity=capacity, max_iters=max_iters,
        distance=distance, pool_size=pool_size, pop_width=pop_width,
        tail_frac=tail_frac)
    pool_ids, pool_keys = out.pool_ids, out.pool_keys

    # --- merge current adjacency (vamana_build.h:424-441) ----------------
    own = graph.neighbors(batch_ids)
    own_keys = _score_against(data, distance, queries, q_norms, own)
    own_keys = topk_ops.mask_duplicate_ids(own_keys, own, pool_ids)
    pool_keys, pool_ids = topk_ops.merge_smallest(
        pool_keys, pool_ids, own_keys, own, pool_size)
    # drop duplicate ids introduced by search re-scoring, keep best-sorted
    pool_keys = topk_ops.mask_first_duplicates(pool_keys, pool_ids)
    pool_keys, pool_ids = topk_ops.sort_by_key(pool_keys, pool_ids)
    pool_ids = jnp.where(jnp.isfinite(pool_keys), pool_ids, -1)

    # --- 2. prune + commit ----------------------------------------------
    # The prune's pairwise matrix is O(P^2) in HBM traffic; capping the
    # prune to the best `prune_pool` candidates (selection virtually never
    # reaches deeper) keeps the candidate capture large while making the
    # prune cheap.  0 = use the full pool (exact reference semantics).
    pp = prune_pool if 0 < prune_pool < pool_size else pool_size
    new_rows, new_degs = _prune_pools(
        data, pool_ids[:, :pp], pool_keys[:, :pp], batch_ids, gen_alpha, r,
        distance, prune_chunk)
    pad_cols = r - new_rows.shape[1]
    if pad_cols > 0:
        new_rows = jnp.pad(new_rows, ((0, 0), (0, pad_cols)),
                           constant_values=-1)
    commit_ids = jnp.where(batch_valid, batch_ids, graph.capacity)
    graph = graph.replace_rows(commit_ids, new_rows, new_degs)

    # --- 3. reverse edges -------------------------------------------------
    dst = new_rows.reshape(-1)
    src = jnp.broadcast_to(batch_ids[:, None], (b, r)).reshape(-1)
    valid_e = (dst >= 0) & jnp.broadcast_to(
        batch_valid[:, None], (b, r)).reshape(-1)

    # drop edges whose src is already in dst's adjacency (dup suppression)
    dst_adj = graph.neighbors(jnp.maximum(dst, 0))          # (b*r, R)
    already = jnp.any(dst_adj == src[:, None], axis=1)
    valid_e = valid_e & ~already

    sort_key = jnp.where(valid_e, dst, _INT_MAX)
    sort_key, dst_s, src_s = jax.lax.sort(
        (sort_key, dst, src), dimension=0, num_keys=1)
    valid_s = sort_key != _INT_MAX
    e = dst_s.shape[0]
    iota_e = jnp.arange(e, dtype=jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), sort_key[1:] != sort_key[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg_start, iota_e, 0))
    rank = iota_e - group_start

    deg_dst = graph.degrees_of(jnp.maximum(dst_s, 0))
    slot = deg_dst + rank
    append_ok = valid_s & (slot < r)
    graph = graph.scatter_edges(dst_s, slot, src_s, append_ok)

    # --- 4. on-device overflow grouping + reprune -------------------------
    # Overflow entries are contiguous per destination in the sorted edge
    # stream; group them into a (M_cap, KB) backedge matrix without leaving
    # the device (the BackedgeBuffer analog, vamana_build.h:106-162).
    overflow = valid_s & (slot >= r)
    m_cap = b                      # static: at most one group per batch node
    kb = MAX_BACKEDGES
    prev_ov = jnp.concatenate([jnp.zeros((1,), bool), overflow[:-1]])
    ov_first = overflow & (~prev_ov | seg_start)
    group_id = jnp.cumsum(ov_first.astype(jnp.int32)) - 1
    first_ov_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(ov_first, iota_e, 0))
    col = iota_e - first_ov_idx
    in_cap = overflow & (group_id < m_cap) & (col < kb)
    dropped = jnp.sum(overflow & ~in_cap)

    oob_back = m_cap * kb
    back_flat = jnp.full((m_cap * kb + 1,), -1, jnp.int32)
    back_idx = jnp.where(in_cap, group_id * kb + col, oob_back)
    back_flat = back_flat.at[back_idx].set(src_s, mode="drop")
    backedges = back_flat[:m_cap * kb].reshape(m_cap, kb)

    ov_ids = jnp.zeros((m_cap,), jnp.int32)
    ov_idx = jnp.where(ov_first & (group_id < m_cap), group_id, m_cap)
    ov_ids = jnp.concatenate([ov_ids, jnp.zeros((1,), jnp.int32)])\
        .at[ov_idx].set(dst_s, mode="drop")[:m_cap]
    n_groups = jnp.sum(ov_first.astype(jnp.int32))
    ov_valid = jnp.arange(m_cap) < jnp.minimum(n_groups, m_cap)

    graph = _reprune_body(graph, data, ov_ids, ov_valid, backedges,
                          alpha=rev_alpha, prune_to=prune_to,
                          distance=distance, max_degree=r,
                          prune_chunk=prune_chunk)
    return graph, dropped


def _reprune_body(graph: NeighborGraph,
                  data: VectorDataset,
                  node_ids: jax.Array,
                  node_valid: jax.Array,
                  backedges: jax.Array,
                  *,
                  alpha: float, prune_to: int,
                  distance: dist_ops.DistanceType, max_degree: int,
                  prune_chunk: int) -> NeighborGraph:
    """Re-prune overflowing destinations (vamana_build.h:510-579): candidate
    set = current adjacency ∪ overflow backedges, pruned to ``prune_to``."""
    queries = data.get(node_ids)
    q_norms = data.norms_of(node_ids)
    adj = graph.neighbors(jnp.maximum(node_ids, 0))
    cand_ids = jnp.concatenate([adj, backedges], axis=1)
    cand_keys = _score_against(data, distance, queries, q_norms, cand_ids)
    cand_keys = topk_ops.mask_first_duplicates(cand_keys, cand_ids)
    cand_keys = jnp.where(node_valid[:, None], cand_keys, jnp.inf)
    cand_keys, cand_ids = topk_ops.sort_by_key(cand_keys, cand_ids)
    cand_ids = jnp.where(jnp.isfinite(cand_keys), cand_ids, -1)

    rows, degs = _prune_pools(data, cand_ids, cand_keys, node_ids,
                              alpha, prune_to, distance, prune_chunk)
    pad_cols = max_degree - rows.shape[1]
    if pad_cols > 0:
        rows = jnp.pad(rows, ((0, 0), (0, pad_cols)), constant_values=-1)
    commit = jnp.where(node_valid, node_ids, graph.capacity)
    return graph.replace_rows(commit, rows, degs)


reprune_nodes = partial(jax.jit, static_argnames=(
    "prune_to", "distance", "max_degree", "prune_chunk"))(
        _reprune_body)


# ---------------------------------------------------------------------------
# Host-side build driver
# ---------------------------------------------------------------------------

def default_batch_size(n: int) -> int:
    """Reference batch schedule: num_batches = max(40, n/4096)
    (vamana_build.h:239-249) => batch = min(4096, ceil(n/40))."""
    return max(8, min(4096, -(-n // 40)))


def build_graph(data: VectorDataset,
                params: VamanaBuildParameters,
                distance,
                *,
                entry_point: Optional[int] = None,
                batch_size: Optional[int] = None,
                prune_chunk: int = 256,
                pop_width: int = 4,
                prune_pool: int = 0,
                tail_frac: int = 1,
                first_pass_window: Optional[int] = None,
                sampled_entries: bool = False,
                entry_sample_size: Optional[int] = None,
                logger=None,
                timer: Optional[timing.Timer] = None,
                ) -> Tuple[NeighborGraph, int]:
    """Build a Vamana graph over ``data``; returns (graph, entry_point).

    Follows the reference's auto_build pipeline (index.h:945-971): medioid
    entry point, two construct passes (reverse-edge alphas 1.0 then alpha).

    ``first_pass_window``: optional smaller search window for pass 1 — the
    alpha=1.0 pass only lays down an initial graph that pass 2 rewires, so
    a cheaper pass-1 search trades little quality for proportional time.

    ``sampled_entries``: start each node's build search from its nearest
    row in a resident ``entry_sample_size``-row sample instead of the
    medioid (entry.py; the serving lever applied to build rounds).  Pass 1
    masks sample rows not yet inserted so searches never enter edge-less
    nodes.
    """
    distance = dist_ops.as_distance(distance)
    params = params.resolved(distance)
    logger = svs_logging.as_logger(logger)
    timer = timing.as_timer(timer)
    n = data.n
    r = params.graph_max_degree

    with timer.scope("entry point"):
        entry = entry_point if entry_point is not None else \
            compute_medioid(data)
    entry_ids = jnp.asarray([entry], dtype=jnp.int32)

    sampler = None
    sample_ids_host = None
    if sampled_entries:
        from .entry import build_sampler
        sampler = build_sampler(data, entry_sample_size, seed=0)
        sample_ids_host = np.asarray(sampler.ids)

    graph = NeighborGraph.empty(n, r)
    b = batch_size if batch_size is not None else default_batch_size(n)
    pool_size = params.max_candidate_pool_size
    num_batches = -(-n // b)
    pass_alphas = (1.0, float(params.alpha))
    pass_windows = (first_pass_window or params.window_size,
                    params.window_size)
    logger.info("vamana build: n=%d R=%d windows=%s pool=%d batch=%d "
                "(%d rounds/pass)", n, r, pass_windows, pool_size, b,
                num_batches)

    dropped_counts = []
    for pass_idx, rev_alpha in enumerate(pass_alphas):
        window = pass_windows[pass_idx]
        capacity = window
        max_iters = search_mod.default_max_iters(window)
        with timer.scope(f"pass {pass_idx + 1}"):
            for batch_idx in range(num_batches):
                start = batch_idx * b
                ids = np.arange(start, start + b, dtype=np.int32)
                valid = ids < n
                ids = np.minimum(ids, n - 1)
                # pass 1 inserts in id order: sample rows >= start have no
                # adjacency yet and must not be selected as entries
                sample_invalid = None if sampler is None else jnp.asarray(
                    sample_ids_host >= (n if pass_idx else start))
                # fully-fused async round: no host sync — rounds pipeline
                graph, dropped = build_round(
                    graph, data, jnp.asarray(ids), jnp.asarray(valid),
                    entry_ids, sampler, sample_invalid,
                    window=window, capacity=capacity, max_iters=max_iters,
                    distance=distance, pool_size=pool_size,
                    gen_alpha=float(params.alpha),
                    rev_alpha=float(rev_alpha), prune_to=params.prune_to,
                    max_degree=r, prune_chunk=prune_chunk,
                    pop_width=pop_width, prune_pool=prune_pool,
                    tail_frac=tail_frac)
                dropped_counts.append(dropped)
            jax.block_until_ready(graph.adjacency)
        logger.info("pass %d/%d complete (alpha=%.3f)", pass_idx + 1,
                    len(pass_alphas), rev_alpha)
    total_dropped = int(sum(int(d) for d in dropped_counts))
    if total_dropped:
        logger.debug("build dropped %d overflow backedges beyond static "
                     "caps", total_dropped)
    return graph, int(entry)
