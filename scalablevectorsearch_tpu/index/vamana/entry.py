"""Per-query sampled entry-point selection.

The reference seeds every greedy search from one global entry point — the
dataset medioid (``include/svs/index/vamana/index.h:268`` stores it;
``greedy_search.h:62-94``'s ``EntryPointInitializer`` seeds the buffer) —
so every query pays the graph-radius walk from the center to its own
neighborhood.  That cost is invisible on a CPU (the walk is a handful of
cache-resident hops) but dominates TPU lockstep serving, where each hop is
a full sequential iteration through the ~45 ms-deep dispatch pipeline.

TPU-native reformulation: keep a small uniform sample of the dataset
resident (S rows), and pick each query's nearest sampled row with ONE MXU
matmul fused into the search dispatch — (B, d) x (d, S) is a few hundred
MFLOPs, effectively free next to a single beam iteration.  The walk then
starts inside the query's own region.

Measured (100k x 128, packed serving, real TPU — PERF.md round-3): medioid
w=24 -> recall 0.9030 at 27.5 lockstep iterations; sampled S=1024 w=12 ->
recall 0.9238 at 9.5 iterations and ~3x the device-level QPS.  Recall at
equal window only goes UP (w=16: 0.9535 vs 0.8661) because the beam spends
its slots in the right neighborhood instead of on the approach path.

The sample size must scale with the dataset: the selection matmul is
effectively free on the MXU, but a sample that under-covers the dataset's
cluster structure strands queries in far-away regions (measured 10M x 96,
~19.5k clusters: S=1024 covers ~5% of clusters and recall collapses to
0.46 @ w=32 where the medioid entry gives 0.88, and S=65536 gives 0.9666
@ 2.7x the medioid QPS).  ``n_samples=None`` therefore auto-scales as
``clip(n // 128, 1024, 65536)`` — at 100k that is the measured S=1024
sweet spot (4096/16384 bought no recall there), at 10M the measured
S=65536 optimum; the cap bounds the (B, S) key panel the select
materializes.  E>1 entries per query only helped marginally at w=12.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import distance as dist_ops

DEFAULT_SAMPLES = 1024
MAX_SAMPLES = 65536

# Above this sample size the (B, S) selection panel is folded over
# S-chunks with a running min instead of materialized whole: at the
# S=65536 cap and B=2048 the one-shot panel is a 512 MB f32 transient,
# while 8192-row chunks bound it at 64 MB with identical results (the
# chunk matmuls are the same MXU work either way).
SELECT_CHUNK = 8192


def auto_samples(n: int) -> int:
    """Scale-aware default sample size: ~n/128 rows, floored at the 100k
    sweet spot and capped to bound the (B, S) selection panel.

    Both ends are measured (PERF.md round-3 sampler-at-scale): 100k wants
    S=1024 (larger buys nothing), 10M wants the full 65536 cap —
    S=65536 served 0.9666 @ 42.8k QPS (w=20) where S=1024 collapsed to
    0.46 and the medioid entry gave 0.9225 @ 15.7k.  QPS *rises* with S
    at scale: starting in the right cluster saves more iterations than
    the bigger select matmul costs."""
    return int(min(max(DEFAULT_SAMPLES, n // 128), MAX_SAMPLES))


@partial(jax.tree_util.register_dataclass,
         data_fields=["vectors", "norms_sq", "ids"],
         meta_fields=[])
@dataclasses.dataclass
class EntrySampler:
    """Resident dataset sample for per-query entry selection.

    ``ids`` slots may be -1 (excluded); their keys are masked to +inf so
    ``select`` never returns them.  All arrays are device-resident; the
    whole structure is a pytree so it traces straight into the fused
    serving dispatch.
    """

    vectors: jax.Array   # (S, d_pad) f32
    norms_sq: jax.Array  # (S,) f32
    ids: jax.Array       # (S,) int32, -1 = excluded slot

    def select(self, distance, queries: jax.Array,
               n_entries: int = 1,
               invalid: Optional[jax.Array] = None) -> jax.Array:
        """(B, d_pad) queries -> (B, n_entries) int32 entry ids.

        ``invalid``: optional (S,) bool marking slots to exclude for this
        call (e.g. a dynamic index's deleted mask gathered at the sample
        ids).
        """
        distance = dist_ops.as_distance(distance)
        q = queries.astype(jnp.float32)
        bad = self.ids < 0
        if invalid is not None:
            bad = bad | invalid
        s = self.vectors.shape[0]
        if s > SELECT_CHUNK:
            return self._select_chunked(distance, q, bad, n_entries)
        keys = dist_ops.pairwise_keys(distance, q, self.vectors,
                                      vector_norms_sq=self.norms_sq)
        keys = jnp.where(bad[None, :], jnp.inf, keys)
        if n_entries == 1:
            return self.ids[jnp.argmin(keys, axis=-1)][:, None]
        _, idx = jax.lax.top_k(-keys, n_entries)
        return self.ids[idx]

    def _select_chunked(self, distance, q: jax.Array, bad: jax.Array,
                        n_entries: int = 1) -> jax.Array:
        """Running-min fold over SELECT_CHUNK-row sample slices.

        Bit-equal to the one-shot panel argmin for the first minimum (ties
        resolve to the lowest slot index either way since chunks scan in
        slot order), but the live key transient is (B, SELECT_CHUNK)
        instead of (B, S).  ``n_entries > 1`` folds a running
        top-``n_entries`` merge instead (same selected SET as the one-shot
        top_k; tie ordering may differ)."""
        s, b = self.vectors.shape[0], q.shape[0]
        n_chunks = -(-s // SELECT_CHUNK)
        pad = n_chunks * SELECT_CHUNK - s
        vecs = jnp.pad(self.vectors, ((0, pad), (0, 0)))
        # +inf norms make padded rows lose every L2 comparison; `bad`
        # padding covers MIP/cosine (whose keys ignore vector norms)
        norms = jnp.pad(self.norms_sq, (0, pad),
                        constant_values=jnp.inf)
        ids = jnp.pad(self.ids, (0, pad), constant_values=-1)
        badp = jnp.pad(bad, (0, pad), constant_values=True)
        xs = (vecs.reshape(n_chunks, SELECT_CHUNK, -1),
              norms.reshape(n_chunks, SELECT_CHUNK),
              ids.reshape(n_chunks, SELECT_CHUNK),
              badp.reshape(n_chunks, SELECT_CHUNK))

        if n_entries > 1:
            from ...ops import topk as topk_ops

            def step_multi(carry, x):
                best_keys, best_ids = carry
                cv, cn, ci, cb = x
                keys = dist_ops.pairwise_keys(distance, q, cv,
                                              vector_norms_sq=cn)
                keys = jnp.where(cb[None, :], jnp.inf, keys)
                return topk_ops.merge_smallest(
                    best_keys, best_ids, keys,
                    jnp.broadcast_to(ci[None, :], keys.shape),
                    n_entries), None

            init = (jnp.full((b, n_entries), jnp.inf, jnp.float32),
                    jnp.full((b, n_entries), -1, jnp.int32))
            (_, best_ids), _ = jax.lax.scan(step_multi, init, xs)
            return jnp.where(best_ids < 0, self.ids[0], best_ids)

        def step(carry, x):
            best_key, best_id = carry
            cv, cn, ci, cb = x
            keys = dist_ops.pairwise_keys(distance, q, cv,
                                          vector_norms_sq=cn)
            keys = jnp.where(cb[None, :], jnp.inf, keys)
            j = jnp.argmin(keys, axis=-1)
            ck = jnp.take_along_axis(keys, j[:, None], axis=-1)[:, 0]
            better = ck < best_key
            return (jnp.where(better, ck, best_key),
                    jnp.where(better, ci[j], best_id)), None

        init = (jnp.full((b,), jnp.inf, jnp.float32),
                jnp.full((b,), -1, jnp.int32))
        (_, best_id), _ = jax.lax.scan(step, init, xs)
        # all-invalid degenerate case: the one-shot path's argmin over an
        # all-inf panel returns slot 0's id; match it (a raw -1 would wrap
        # to the last data row in greedy_search seeding)
        best_id = jnp.where(best_id < 0, self.ids[0], best_id)
        return best_id[:, None]


def build_sampler(data, n_samples: Optional[int] = None,
                  *, ids: Optional[np.ndarray] = None,
                  seed: int = 0) -> EntrySampler:
    """Sample ``n_samples`` rows uniformly from a dataset-protocol object
    (``None`` = :func:`auto_samples`, scaled to the dataset size).

    ``ids`` overrides the uniform sample (callers with liveness knowledge —
    the dynamic index — pass their own alive slot ids).  The sample is
    decompressed to f32 once (``get_f32``), so compressed datasets select
    entries at full precision.
    """
    if n_samples is None:
        n_samples = auto_samples(data.n)
    if ids is None:
        n = data.n
        rng = np.random.default_rng(seed)
        size = min(n_samples, n)
        ids = rng.choice(n, size=size, replace=False).astype(np.int32)
    else:
        ids = np.asarray(ids, dtype=np.int32)[:n_samples]
    dev_ids = jnp.asarray(ids)
    vectors = data.get_f32(dev_ids)
    norms = jnp.sum(vectors * vectors, axis=-1)
    return EntrySampler(vectors=vectors, norms_sq=norms, ids=dev_ids)
