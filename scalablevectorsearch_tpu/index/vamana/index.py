"""Static Vamana index.

TPU-native analog of the reference's ``VamanaIndex``
(``include/svs/index/vamana/index.h:268``): owns the dataset, the neighbor
graph, the entry point, the distance, and mutable search parameters; provides
batch search (``index.h:556-603``), build (``auto_build`` index.h:945-971),
3-directory save/load (``index.h:802-817``, ``auto_assemble`` index.h:999),
and vector reconstruction (``index.h:630-671``).

Where the reference parallelizes batch search with a threadpool and per-thread
search buffers, this index tiles queries into fixed-size lockstep batches and
runs the compiled batched beam search per tile.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.data import VectorDataset
from ...core.graph import NeighborGraph
from ...core.query_result import QueryResult
from ...lib import datatypes as dt
from ...lib import saveload
from ...lib import timing
from ...ops import distance as dist_ops
from . import build as build_mod
from . import search as search_mod
from .params import (SearchBufferConfig, VamanaBuildParameters,
                     VamanaSearchParameters, UNSPECIFIED)

CONFIG_FILENAME = "vamana_config.json"


@dataclasses.dataclass(frozen=True)
class _BatchPlan:
    """Equal-size lockstep batch partition of ``nq`` queries.

    The reference partitions batch searches into equal per-thread chunks with
    zero per-chunk overhead (index.h:556-603); the lockstep analog equalizes
    batch SHAPES so every dispatch reuses one compiled executable and no
    batch is mostly padding (5000 queries at qb=2048 used to dispatch
    2048+2048+904 — two executables, one straggler batch)."""

    rows: int       # padded rows per batch (multiple of 8)
    n_batches: int

    @classmethod
    def plan(cls, nq: int, max_rows: int) -> "_BatchPlan":
        nb = max(1, -(-nq // max(max_rows, 8)))
        rows = dt.pad_to(-(-nq // nb), 8)
        nb = max(1, -(-nq // rows))   # padding may shrink the batch count
        return cls(rows=rows, n_batches=nb)


def _host_rerank_batch(ids: np.ndarray, q: np.ndarray,
                       vectors: np.ndarray, norms_sq: np.ndarray,
                       distance, k: int):
    """Exact re-scoring of a returned beam on the HOST, where the
    full-precision query still lives.

    Recovers the final-ranking recall an int8 query upload loses on device
    at ZERO extra upload bytes (PERF.md round 5: int8 w=16 recall 0.847 ->
    0.892 with exact beam rerank at 20k; plain f16 = 0.889).  Norm-algebra
    form — one fancy-index gather + one batched row-matvec per batch, no
    (b, k', d) residual temporary; mirrors ops/distance.gathered_keys."""
    safe = np.maximum(ids, 0)
    vecs = vectors[safe]                          # (b, k', d)
    dots = np.einsum("bkd,bd->bk", vecs, q, optimize=True)
    if distance == dist_ops.DistanceType.MIP:
        keys = -dots
    else:
        xn = norms_sq[safe]
        qn = np.sum(q * q, axis=-1, dtype=np.float64).astype(np.float32)
        if distance == dist_ops.DistanceType.L2:
            keys = np.maximum(qn[:, None] - 2.0 * dots + xn, 0.0)
        else:                                     # cosine
            denom = np.sqrt(np.maximum(qn[:, None], 1e-30)) * \
                np.sqrt(np.maximum(xn, 1e-30))
            keys = -dots / denom
    keys = np.where(ids < 0, np.inf, keys.astype(np.float32))
    order = np.argsort(keys, axis=1, kind="stable")[:, :k]
    ids_k = np.take_along_axis(ids, order, axis=1)
    keys_k = np.take_along_axis(keys, order, axis=1)
    # value_from_key is pure sign algebra — stays in numpy: routing it
    # through jnp here would cost two tunnel round trips PER BATCH
    return ids_k, dist_ops.value_from_key(distance, keys_k)


@dataclasses.dataclass
class PendingSearch:
    """In-flight batch search: device work dispatched, results not yet read.

    The TPU serving analog of the reference's concurrent per-thread searches
    (index.h:556-603): hold several of these to pipeline the host-side query
    upload of one search with the device compute of another; ``result()``
    blocks only on the final device->host reads (whose async copies were
    already started at dispatch time)."""

    pending: list
    rows: int
    nq: int
    out_ids: np.ndarray
    out_vals: np.ndarray
    translate_ids: Optional[object] = None  # host slot->external id hook
    # (vectors, norms_sq, queries_f32, distance, k): exact host-side beam
    # re-scoring applied at result() time (enable_host_rerank)
    host_rerank: Optional[tuple] = None

    def result(self) -> QueryResult:
        for start, ids_k, vals_k in self.pending:
            stop = min(start + self.rows, self.nq)
            slots = np.asarray(ids_k)[: stop - start]
            vals = np.asarray(vals_k)[: stop - start]
            if self.host_rerank is not None:
                vectors, norms_sq, queries, distance, k = self.host_rerank
                slots, vals = _host_rerank_batch(
                    slots, queries[start:stop], vectors, norms_sq,
                    distance, k)
            if self.translate_ids is not None:
                slots = self.translate_ids(slots)
            # width-aware: k may exceed the dispatch width (k > n clamps
            # the beam; the extra columns keep their -1 / +inf prefill)
            self.out_ids[start:stop, : slots.shape[1]] = slots
            self.out_vals[start:stop, : slots.shape[1]] = \
                vals[:, : slots.shape[1]]
        self.pending = []
        return QueryResult(ids=self.out_ids, distances=self.out_vals)


def query_upload_dtype():
    """Host->device query transfer dtype (default float16).

    The serving tunnel's in-context upload bandwidth is the dominant e2e
    cost beyond device compute (PERF.md round-3 serving decomposition:
    f32 uploads 52.6k QPS, half-width 65.0k, device ceiling 76.9k at
    100k/w24).  Queries are cast back to f32 on device before scoring, so
    the only effect is ~1e-3 relative rounding of the query values —
    measured recall impact at the bench operating point is below the
    run-to-run jitter.  Set ``SVT_QUERY_UPLOAD_DTYPE=float32`` to restore
    full-precision uploads (or ``bfloat16`` for range over mantissa)."""
    name = os.environ.get("SVT_QUERY_UPLOAD_DTYPE", "float16")
    return _UPLOAD_DTYPES[name]


_UPLOAD_DTYPES = {
    "float32": np.dtype(np.float32), "float16": np.dtype(np.float16),
    "bfloat16": np.dtype(jnp.bfloat16), "int8": np.dtype(np.int8)}


def upload_dtype_for(q_host: np.ndarray, override=None) -> np.dtype:
    """Transfer dtype for this query set: ``override`` (a per-index
    ``query_upload_dtype`` attribute, e.g. set by the calibrator) or the
    ``query_upload_dtype`` env default — unless the values overflow
    float16's range (max 65504) — raw unnormalized feature
    vectors would silently map to ±inf and poison every distance, so such
    query sets fall back to full-width uploads (bfloat16 shares float32's
    exponent range and needs no guard)."""
    dtype = _UPLOAD_DTYPES[override] if override else query_upload_dtype()
    if dtype == np.float16 and q_host.size and \
            np.max(np.abs(q_host)) > np.finfo(np.float16).max:
        return np.dtype(np.float32)
    return dtype


def prepare_query_upload(q_host: np.ndarray, override=None):
    """Quantize/cast a padded f32 host query block for the tunnel upload.

    Returns ``(q_upload, q_scale)``: ``q_scale`` is ``None`` for float
    transfer dtypes; for ``SVT_QUERY_UPLOAD_DTYPE=int8`` it is a per-query
    (n, 1) f32 max-abs/127 scale uploaded beside the codes (4 B/query
    against the 128 B saved on a d=128 f16 row) and applied on device by
    :func:`dequantize_queries` inside the fused dispatch.  Per-QUERY
    scaling keeps an outlier query from crushing everyone else's mantissa
    (the same reason LVQ scales per vector, quantization/lvq.py)."""
    dtype = upload_dtype_for(q_host, override)
    if dtype == np.int8:
        scale = np.max(np.abs(q_host), axis=1, keepdims=True) / 127.0
        scale[scale == 0.0] = 1.0
        q = np.rint(q_host / scale).astype(np.int8)
        return q, scale.astype(np.float32)
    return q_host.astype(dtype, copy=False), None


def dequantize_queries(q, q_scale):
    """Device-side inverse of :func:`prepare_query_upload` (traced)."""
    q = q.astype(jnp.float32)
    return q if q_scale is None else q * q_scale


@partial(jax.jit, static_argnames=(
    "k", "window", "capacity", "max_iters", "distance",
    "tail_frac", "visited_size", "two_level", "n_entries", "pop_width"))
def _search_batch(graph, data, packed, rerank_view, sampler, q, q_scale,
                  entry_ids,
                  *, k: int, window: int, capacity: int,
                  max_iters: int, distance, tail_frac: int,
                  visited_size: int, two_level: bool, n_entries: int = 1,
                  pop_width: int = search_mod.SERVING_POP_WIDTH):
    """One fully-fused serving dispatch: (optional) per-query entry
    selection + beam search + (optional) two-level rerank + key->distance
    conversion — the host does nothing between dispatches but enqueue (the
    reference's zero-overhead batch partition, index.h:556-603).  ``q`` is
    one equal-shape batch whose upload was started asynchronously by the
    caller, so batch i+1's host->device transfer rides the tunnel while
    batch i computes (the transfer overlap that took round-2 serving
    16k -> 41k QPS); it may arrive in a half-width dtype
    (``query_upload_dtype``) and is cast to f32 here."""
    from ...index.ivf.index import rerank_kernel
    q = dequantize_queries(q, q_scale)
    if sampler is not None:
        # one MXU matmul against the resident sample replaces the
        # medioid-to-neighborhood walk (entry.py; ~3x fewer lockstep
        # iterations at BETTER recall, measured)
        entry_ids = sampler.select(distance, q, n_entries=n_entries)
    out = search_mod.greedy_search(
        graph, data, q, entry_ids,
        window=window, capacity=capacity, max_iters=max_iters,
        distance=distance, packed=packed, tail_frac=tail_frac,
        visited_size=visited_size, pop_width=pop_width)
    ids, keys = out.ids, out.keys
    if two_level:
        # traversal keys come from the primary level; rerank the retained
        # beam with the residual-corrected reconstruction (the reference's
        # two-level search flow, vamana/extensions.h)
        keys, ids = rerank_kernel(rerank_view, q, None, ids, k=k,
                                  distance=distance)
    return ids[:, :k], dist_ops.value_from_key(distance, keys[:, :k])


def saveload_pack_tree(directory: str, stream) -> None:
    """Pack a nested checkpoint tree (config + graph/ + data/) as one
    archive stream."""
    import io
    entries = {}
    for root, _dirs, files in os.walk(directory):
        for name in files:
            path = os.path.join(root, name)
            rel = os.path.relpath(path, directory)
            with open(path, "rb") as f:
                entries[rel] = f.read()
    header = json.dumps({"archive": "svs_tpu_tree", "version": "v0.0.1",
                         "files": [{"name": k, "size": len(v)}
                                   for k, v in sorted(entries.items())]}
                        ).encode()
    stream.write(len(header).to_bytes(8, "little"))
    stream.write(header)
    for k in sorted(entries):
        stream.write(entries[k])


def saveload_unpack_tree(stream, directory: str) -> None:
    header_len = int.from_bytes(stream.read(8), "little")
    header = json.loads(stream.read(header_len))
    if header.get("archive") != "svs_tpu_tree":
        raise ValueError("not an svs_tpu tree archive")
    for entry in header["files"]:
        path = os.path.join(directory, entry["name"])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(stream.read(entry["size"]))


class VamanaIndex:
    """Static (non-mutable) Vamana graph index."""

    SCHEMA = "vamana_index_parameters"
    VERSION = saveload.Version(0, 0, 2)  # 0.0.2: optional entry_sampler
    # per-index host->device query transfer dtype override
    # ("float32"/"float16"/"bfloat16"/"int8"); None defers to the
    # SVT_QUERY_UPLOAD_DTYPE env default.  Every index family honors an
    # instance-level assignment of this name; the calibrator's int8 axis
    # sets it on the winner (calibrate.py)
    query_upload_dtype = None

    def __init__(self,
                 graph: NeighborGraph,
                 data: VectorDataset,
                 entry_point: int,
                 distance,
                 build_parameters: Optional[VamanaBuildParameters] = None,
                 search_parameters: Optional[VamanaSearchParameters] = None,
                 # device-resident, the lockstep loop is LATENCY-bound and
                 # nearly flat in B (194k QPS at B=8192 vs 69k at B=2048,
                 # measured 100k w=11) — raise this for device-side or
                 # very large query sets.  E2E through the serving tunnel,
                 # 2048 measured FASTER (3 overlapped 1672-row batches
                 # 99-115k vs one 5000-row batch 61-95k across sessions):
                 # finer batches pipeline upload/compute/readback better.
                 query_batch_size: int = 2048,
                 logger=None):
        self.graph = graph
        self.data = data
        self.entry_point = int(entry_point)
        self.distance = dist_ops.as_distance(distance)
        self.build_parameters = build_parameters
        self._search_parameters = (search_parameters or
                                   VamanaSearchParameters())
        self.query_batch_size = query_batch_size
        self.logger = logger
        self._packed = None  # packed neighborhoods (enable_packed_serving)
        self._entry_sampler = None   # per-query entries (enable_entry_sampler)
        self._entry_n = 1
        self._entry_cfg = None       # persisted sampler config (save/assemble)
        # lockstep tail compaction (search.py greedy_search tail_frac):
        # finish each batch's stragglers on a 1/4-size compacted slice
        self.tail_frac = 4
        # beam entries expanded per lockstep iteration (multi-pop; see
        # greedy_search pop_width) — serving default measured optimal at 4
        self.pop_width = search_mod.SERVING_POP_WIDTH
        self._host_rerank = None     # (vectors, norms_sq) — enable_host_rerank

    # -- construction ---------------------------------------------------------
    @classmethod
    def build(cls,
              parameters: VamanaBuildParameters,
              data,
              distance,
              *,
              dtype=None,
              batch_size: Optional[int] = None,
              pop_width: int = 4,
              build_tail_frac: int = 4,
              first_pass_window: Optional[int] = None,
              sampled_entries: bool = False,
              entry_sample_size: Optional[int] = None,
              timer: Optional[timing.Timer] = None,
              logger=None,
              **kwargs) -> "VamanaIndex":
        """Build from an array or any dataset-protocol object (reference
        auto_build); compressed datasets (SQ/LVQ) build via their
        decompression accessors like the reference's DecompressionAdaptor."""
        if not hasattr(data, "norms_sq"):  # raw array -> uncompressed dataset
            data = VectorDataset.from_array(data, dtype=dtype)
        distance = dist_ops.as_distance(distance)
        parameters = parameters.resolved(distance)
        # Two-level LVQ: build through the full reconstruction (the
        # reference's DecompressionAdaptor, quantization/scalar.h:548);
        # serving traverses the primary level only.
        build_data = data.full_view() \
            if getattr(data, "residual_bits", 0) else data
        graph, entry = build_mod.build_graph(
            build_data, parameters, distance, batch_size=batch_size,
            pop_width=pop_width, tail_frac=build_tail_frac,
            first_pass_window=first_pass_window,
            sampled_entries=sampled_entries,
            entry_sample_size=entry_sample_size,
            timer=timer, logger=logger)
        index = cls(graph, data, entry, distance,
                    build_parameters=parameters, logger=logger, **kwargs)
        if sampled_entries:
            # a sampled-entries graph keeps no medioid approach path — it
            # is only navigable with per-query sampled entries, so the
            # sampler is mandatory (and persisted by save/assemble)
            index.enable_entry_sampler(n_samples=entry_sample_size)
        return index

    # -- properties -------------------------------------------------------------
    @property
    def size(self) -> int:
        return self.data.n

    @property
    def dimensions(self) -> int:
        return self.data.dim

    @property
    def search_parameters(self) -> VamanaSearchParameters:
        return self._search_parameters

    @search_parameters.setter
    def search_parameters(self, params: VamanaSearchParameters) -> None:
        self._search_parameters = params

    @property
    def search_window_size(self) -> int:
        return self._search_parameters.buffer_config.search_window_size

    @search_window_size.setter
    def search_window_size(self, window: int) -> None:
        self._search_parameters = self._search_parameters.with_window(window)

    # -- packed-neighborhood serving ---------------------------------------------
    def enable_packed_serving(self, dtype=jnp.bfloat16,
                              chunk: int = 65536) -> None:
        """Materialize inline neighbor vectors for gather-bound serving
        (``packed.pack_neighborhoods``): ~r-fold fewer HBM row gathers per
        search iteration at ``capacity * R * d * itemsize`` bytes of HBM.

        LVQ datasets pack neighbor CODES instead
        (``packed.pack_neighborhoods_lvq``): same r-fold row reduction at
        1/4 (LVQ8) to 1/8 (LVQ4) of the bf16 packed footprint, with exact
        primary decode (bit-identical to unpacked LVQ traversal; two-level
        kinds keep their residual rerank)."""
        from ...quantization.lvq import LVQDataset
        from .packed import pack_neighborhoods, pack_neighborhoods_lvq
        if isinstance(self.data, LVQDataset):
            self._packed = pack_neighborhoods_lvq(self.graph, self.data,
                                                  chunk=chunk)
            return
        if getattr(self.data, "residual_bits", 0) or \
                not hasattr(self.data, "vectors"):
            raise ValueError("packed serving requires an uncompressed "
                             "VectorDataset or an LVQDataset")
        self._packed = pack_neighborhoods(self.graph, self.data, dtype,
                                          chunk=chunk)

    def disable_packed_serving(self) -> None:
        self._packed = None

    # -- host-side exact rerank ----------------------------------------------------
    def enable_host_rerank(self, host_vectors) -> None:
        """Re-score the returned beam on the HOST with the full-precision
        query at ``result()`` time.

        Pairs with ``SVT_QUERY_UPLOAD_DTYPE=int8``: the device traverses
        with the quantized query (half the f16 upload bytes), and the exact
        final ranking — where most of the int8 recall loss lives — is
        recovered host-side for free upload-wise (PERF.md round 5).  The
        search fetches the full beam capacity instead of k, so the rerank
        has a real candidate pool.  ``host_vectors`` is the (n, dim) host
        array the index was built from — an ``np.load(..., mmap_mode='r')``
        view of the saved dataset works and is kept as-is (NEVER read a
        multi-GB dataset back through the tunnel to obtain it — see
        save_host)."""
        host_vectors = np.asarray(host_vectors)
        if host_vectors.dtype != np.float32:
            host_vectors = host_vectors.astype(np.float32)
        host_vectors = host_vectors[:, : self.data.dim]
        if host_vectors.shape[0] != self.size:
            raise ValueError(
                f"host_vectors rows {host_vectors.shape[0]} != index size "
                f"{self.size}")
        norms = np.einsum("nd,nd->n", host_vectors, host_vectors,
                          optimize=True)
        self._host_rerank = (host_vectors, norms.astype(np.float32))

    def disable_host_rerank(self) -> None:
        self._host_rerank = None

    # -- per-query entry selection -------------------------------------------------
    def enable_entry_sampler(self, n_samples: Optional[int] = None,
                             n_entries: int = 1, seed: int = 0) -> None:
        """Select each query's entry point from a resident dataset sample
        with one MXU matmul fused into the search dispatch (entry.py) —
        replaces the medioid-to-neighborhood walk that dominates lockstep
        serving (measured ~3x fewer iterations at BETTER recall; the
        equal-recall window drops about 2x, e.g. 24 -> 12 at 100k).

        ``n_samples=None`` auto-scales with the dataset size
        (entry.auto_samples — an under-covering sample strands queries at
        10M scale).  Deterministic given ``seed``.  Results differ from
        medioid-entry searches (usually for the better); calibrated
        windows should be re-calibrated after toggling this.
        """
        from .entry import auto_samples, build_sampler
        if n_samples is None:
            n_samples = auto_samples(self.data.n)
        self._entry_sampler = build_sampler(self.data, n_samples, seed=seed)
        self._entry_n = n_entries
        self._entry_cfg = {"n_samples": n_samples, "n_entries": n_entries,
                           "seed": seed}

    def disable_entry_sampler(self) -> None:
        self._entry_sampler = None
        self._entry_n = 1
        self._entry_cfg = None

    # -- search -------------------------------------------------------------------
    def search(self, queries, k: int,
               parameters: Optional[VamanaSearchParameters] = None,
               cancel=None) -> QueryResult:
        """Batch greedy search (reference index.h:556-603).

        ``cancel``: optional zero-arg predicate checked between query-batch
        dispatches (reference cancellation hooks, index.h:504-518); raises
        lib.exceptions.SearchCancelled when it fires."""
        return self.search_async(queries, k, parameters=parameters,
                                 cancel=cancel).result()

    def search_async(self, queries, k: int,
                     parameters: Optional[VamanaSearchParameters] = None,
                     cancel=None) -> "PendingSearch":
        """Dispatch a batch search and return a :class:`PendingSearch`.

        The reference saturates serving throughput with a threadpool of
        concurrent searches (index.h:556-603); the lockstep analog is
        overlapping the host work (query pad + upload) of search call N+1
        with the device compute of call N.  All device work and async
        device->host copies are started before this returns; ``.result()``
        performs only the blocking reads."""
        from ...lib.exceptions import check_cancel
        params = parameters or self._search_parameters
        cfg = params.buffer_config
        # window (pop horizon) may sit BELOW k: the k results come from the
        # final beam, whose capacity is floored at k — the reference's
        # window/capacity split has the same semantics (search_buffer.h:39;
        # its buffer returns k from capacity while window bounds
        # exploration).  Sub-k windows trade recall for fewer lockstep
        # iterations; with multi-pop + sampled entries the recall surplus
        # makes that a live serving operating point (PERF.md).  Single-arg
        # configs (capacity defaulted from the window) keep the reference's
        # k-floor on BOTH (index.h:582 resets both to num_neighbors) — only
        # an explicit window/capacity split opts into sub-k exploration.
        # k can exceed the dataset (reference: trailing invalid neighbors);
        # the beam only ever holds n distinct rows, so dispatch at the
        # clamped width and pad the result columns (an unclamped k=10^5
        # would size the beam kernel's VMEM footprint off a number that
        # has no effect on the answer)
        k_eff = min(k, self.size)
        window = max(cfg.search_window_size, 1)
        if cfg.capacity_defaulted and cfg.search_buffer_capacity < k_eff:
            window = k_eff
        capacity = max(cfg.search_buffer_capacity, window, k_eff)
        # Two-level compressed datasets traverse on the coarse primary and
        # rerank the retained beam with the residual-corrected
        # reconstruction; DEFAULTED configs retain 2x the window so the
        # rerank has a real candidate pool (the reference's
        # calibration_uses_reranking flow widens the buffer the same way;
        # +0.07 recall@10 on LVQ4x8 at equal window, PERF.md round 3; on
        # LVQ8x8 at 10M, 1.25x retention measured -0.0015 recall for
        # QPS within tunnel noise — not worth the trade, PERF.md round 5).
        # An EXPLICIT window/capacity split is honored as given (until
        # round 5 the 2x floor silently overrode explicit splits, which
        # made capacity sweeps unfalsifiable).
        two_level = bool(getattr(self.data, "residual_bits", 0))
        if two_level and cfg.capacity_defaulted:
            capacity = max(capacity, 2 * window)
        max_iters = params.resolved_max_iters()
        # exact visited filter: a ring of pop_width * max_iters ids holds
        # every expansion the bounded loop can make
        visited_size = (self.pop_width * max_iters
                        if params.visited_set else 0)

        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        nq, dim = queries.shape
        if dim != self.data.dim:
            raise ValueError(f"query dim {dim} != dataset dim {self.data.dim}")
        plan = _BatchPlan.plan(nq, self.query_batch_size)
        entry_ids = jnp.asarray([self.entry_point], dtype=jnp.int32)
        out_ids = np.full((nq, k), -1, dtype=np.int64)
        out_vals = np.full((nq, k), np.inf, dtype=np.float32)
        rerank_view = self.data.full_view() if two_level else None
        # host rerank fetches the whole retained beam so the exact
        # host-side re-scoring has a real candidate pool
        hr = self._host_rerank
        k_fetch = min(capacity, self.size) if hr is not None else k_eff
        # ONE host-side pad of the whole query set, then per-batch ASYNC
        # uploads: batch i+1's transfer rides the tunnel while batch i
        # computes, and every equal-shape batch dispatches the same fused
        # executable (device-side search + key conversion) — the host does
        # nothing between dispatches but enqueue (the batch-parallel analog
        # of the reference's per-thread query partitions, index.h:556-603).
        q_host = dt.pad_matrix(queries.astype(np.float32),
                               n_pad=plan.rows * plan.n_batches,
                               d_pad=self.data.padded_dim)
        # half-width (or int8) transfers cut the dominant tunnel cost; the
        # cast back to f32 happens inside the fused dispatch
        q_host, q_scale_host = prepare_query_upload(
            q_host, self.query_upload_dtype)
        pending = []
        for i in range(plan.n_batches):
            check_cancel(cancel)
            q_i = jnp.asarray(q_host[i * plan.rows:(i + 1) * plan.rows])
            scale_i = (None if q_scale_host is None else
                       jnp.asarray(q_scale_host[i * plan.rows:
                                                (i + 1) * plan.rows]))
            ids_k, vals_k = _search_batch(
                self.graph, self.data, self._packed, rerank_view,
                self._entry_sampler, q_i, scale_i, entry_ids,
                k=k_fetch, window=window, capacity=capacity,
                max_iters=max_iters, distance=self.distance,
                tail_frac=self.tail_frac, visited_size=visited_size,
                two_level=two_level, n_entries=self._entry_n,
                pop_width=self.pop_width)
            pending.append((i * plan.rows, ids_k, vals_k))
        # start EVERY device->host copy before the first blocking read:
        # each blocking transfer costs a full tunnel round trip (~45 ms)
        for _start, ids_k, vals_k in pending:
            ids_k.copy_to_host_async()
            vals_k.copy_to_host_async()
        return PendingSearch(pending=pending, rows=plan.rows, nq=nq,
                             out_ids=out_ids, out_vals=out_vals,
                             host_rerank=None if hr is None else
                             (hr[0], hr[1], queries.astype(np.float32),
                              self.distance, k_eff))

    # -- reconstruction -----------------------------------------------------------
    def reconstruct_at(self, ids) -> np.ndarray:
        """Return (decompressed) vectors for the given internal ids
        (reference index.h:630-671)."""
        ids = np.asarray(ids, dtype=np.int64)
        if np.any((ids < 0) | (ids >= self.size)):
            raise IndexError("reconstruct_at: id out of bounds")
        flat = jnp.asarray(ids.reshape(-1))
        vecs = np.asarray(self.data.get_f32(flat))[:, : self.data.dim]
        return vecs.reshape(*ids.shape, self.data.dim)

    # -- persistence -----------------------------------------------------------------
    def save(self, config_dir: str, graph_dir: Optional[str] = None,
             data_dir: Optional[str] = None) -> None:
        """3-directory layout: config / graph / data are independently
        loadable and mix-and-matchable (reference index.h:795-817)."""
        graph_dir = graph_dir or os.path.join(config_dir, "graph")
        data_dir = data_dir or os.path.join(config_dir, "data")
        os.makedirs(config_dir, exist_ok=True)
        saveload.save_to_disk(self.graph, graph_dir)
        saveload.save_to_disk(self.data, data_dir)
        self._save_config(config_dir)

    def save_host(self, config_dir: str, host_vectors) -> None:
        """Save with NO multi-GB blocking device readbacks: the dataset is
        written from the caller's host array (the build input), and the
        adjacency streams off the device in pipelined chunks
        (lib.transfer.to_host_chunked).  A plain :meth:`save` at 10M reads
        ~6.4 GB back through the remote-TPU tunnel, which measured ~2 MB/s
        blocking (PERF.md round 4).  On-disk format is identical to
        :meth:`save` with an f32 dense dataset."""
        from ...core.data import save_vectors_host
        from ...core.graph import save_adjacency_host
        from ...lib.transfer import to_host_chunked
        os.makedirs(config_dir, exist_ok=True)
        host_vectors = np.asarray(host_vectors, np.float32)
        if host_vectors.shape[0] != self.size:
            raise ValueError(
                f"host_vectors rows {host_vectors.shape[0]} != index size "
                f"{self.size}")
        adjacency = to_host_chunked(self.graph.adjacency)[: self.graph.n]
        save_adjacency_host(os.path.join(config_dir, "graph"), adjacency)
        save_vectors_host(os.path.join(config_dir, "data"), host_vectors)
        self._save_config(config_dir)

    def _save_config(self, config_dir: str) -> None:
        build_table = (self.build_parameters.save_table()
                       if self.build_parameters else None)
        table = saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "vamana index parameters",
            "entry_point": self.entry_point,
            "distance": self.distance.value,
            "build_parameters": build_table,
            "search_parameters": self._search_parameters.save_table(),
            # sampled-entries state survives reload: a graph built with
            # sampled_entries=True is only navigable with the sampler on
            "entry_sampler": self._entry_cfg,
        })
        with open(os.path.join(config_dir, CONFIG_FILENAME), "w") as f:
            json.dump(table, f, indent=2)

    def save_stream(self, stream) -> None:
        """Single-stream archive save (reference vamana.h:457-535 packs a
        DirectoryArchiver archive)."""
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            self.save(tmp)
            # flatten: config + graph/ + data/ into one archive of the tree
            saveload_pack_tree(tmp, stream)

    @classmethod
    def assemble_stream(cls, stream, **kwargs) -> "VamanaIndex":
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            saveload_unpack_tree(stream, tmp)
            return cls.assemble(tmp, **kwargs)

    @classmethod
    def assemble(cls, config_dir: str, graph_dir: Optional[str] = None,
                 data_dir: Optional[str] = None, dtype=None,
                 **kwargs) -> "VamanaIndex":
        graph_dir = graph_dir or os.path.join(config_dir, "graph")
        data_dir = data_dir or os.path.join(config_dir, "data")
        with open(os.path.join(config_dir, CONFIG_FILENAME)) as f:
            table = json.load(f)
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        graph = saveload.load_from_disk(NeighborGraph, graph_dir)
        from ...core.loading import dispatch_load
        data = dispatch_load(data_dir, **({"dtype": dtype} if dtype else {}))
        build_params = (VamanaBuildParameters.from_table(
            table["build_parameters"]) if table.get("build_parameters")
            else None)
        search_params = VamanaSearchParameters.from_table(
            table["search_parameters"])
        index = cls(graph, data, table["entry_point"], table["distance"],
                    build_parameters=build_params,
                    search_parameters=search_params, **kwargs)
        sampler_cfg = table.get("entry_sampler")
        if sampler_cfg:
            index.enable_entry_sampler(**sampler_cfg)
        return index
