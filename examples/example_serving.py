"""Serving-throughput example: pipelined searches, packed neighborhoods,
half-width uploads, latency percentiles.

The reference saturates serving QPS with a threadpool of concurrent
searches (include/svs/index/vamana/index.h:556-603); the TPU-native analog
is keeping several whole search calls in flight with ``search_async`` so
call N+1's host pad/upload rides the tunnel while call N computes.

Run: python examples/example_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scalablevectorsearch_tpu as svt


def main():
    data, queries = svt.generate_test_dataset(50_000, 2000, 128, seed=9)
    gt = svt.exhaustive_search(data, queries, 10)

    params = svt.VamanaBuildParameters(
        alpha=1.1, graph_max_degree=32, window_size=100,
        max_candidate_pool_size=300, prune_to=28)
    # sampled_entries: build searches start inside each node's region
    # (~11% faster builds; the entry sampler is then auto-enabled —
    # per-query entries from a resident sample, ~3x fewer lockstep
    # iterations at better recall, entry.py)
    index = svt.Vamana.build(params, data, svt.L2, sampled_entries=True)

    # packed neighborhoods: the HBM row gather is per-row limited on TPU, so
    # serving gathers r-fold fewer, larger rows (PERF.md)
    index.enable_packed_serving()
    # sampled entries roughly halve the equal-recall window (24 -> 12)
    index.search_window_size = 12

    res = index.search(queries, 10)  # warm the executable
    recall = svt.k_recall_at_n(gt, res)

    # --- blocking serving loop (one search at a time) -----------------------
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        index.search(queries, 10)
    qps_blocking = len(queries) * reps / (time.time() - t0)

    # --- pipelined serving loop (several searches in flight) ----------------
    t0 = time.time()
    handles = [index.search_async(queries, 10) for _ in range(reps)]
    results = [h.result() for h in handles]
    qps_pipelined = len(queries) * reps / (time.time() - t0)
    assert np.array_equal(results[0].ids, res.ids)  # identical answers

    print(f"recall@10={recall:.4f}  blocking={qps_blocking:.0f} qps  "
          f"pipelined={qps_pipelined:.0f} qps")

    # --- per-batch latency distribution -------------------------------------
    qb = index.index.query_batch_size
    index.search(queries[:qb], 10)  # warm this exact batch shape
    lat = []
    for _ in range(8):
        t1 = time.time()
        index.search(queries[:qb], 10)
        lat.append((time.time() - t1) * 1e3)
    print(f"batch latency ({qb} queries): "
          f"p50={np.percentile(lat, 50):.1f} ms  "
          f"p95={np.percentile(lat, 95):.1f} ms")


if __name__ == "__main__":
    main()
