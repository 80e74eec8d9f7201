#!/usr/bin/env python
"""Headline benchmark: Vamana QPS at recall@10 >= 0.9.

Builds a Vamana index over a clustered synthetic dataset on the real TPU,
sweeps the search window to find the smallest config reaching recall@10 >= 0.9
against exact (flat) ground truth, and reports steady-state QPS there.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

``vs_baseline`` is measured QPS divided by BASELINE_QPS — a nominal stand-in
for the reference's CPU throughput at the same operating point (the reference
repo publishes no in-tree absolute QPS numbers; see BASELINE.md).

Environment knobs: SVT_BENCH_N (default 100000), SVT_BENCH_DIM (128),
SVT_BENCH_QUERIES (5000).  The query count is the throughput-measurement
batch: the TPU sits behind a ~45 ms tunnel, so QPS is measured at a batch
size large enough to amortize per-dispatch latency (the reference measures
steady-state QPS the same way — full query sets per run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import scalablevectorsearch_tpu as svt  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.params import (  # noqa: E402
    VamanaBuildParameters)

# Nominal reference operating point: SVS on a ~48-core Xeon serves O(10k) QPS
# at recall@10=0.9 on ~100k-1M scale f32 datasets (extrapolated from the
# published Pareto claims; no in-tree numbers exist — BASELINE.md).
BASELINE_QPS = 10_000.0


def main():
    n = int(os.environ.get("SVT_BENCH_N", 100_000))
    dim = int(os.environ.get("SVT_BENCH_DIM", 128))
    nq = int(os.environ.get("SVT_BENCH_QUERIES", 5000))
    k = 10

    data, queries = svt.generate_test_dataset(n, nq, dim, seed=42)

    t0 = time.time()
    alpha = float(os.environ.get("SVT_BENCH_ALPHA", 1.1))
    params = VamanaBuildParameters(alpha=alpha, graph_max_degree=32,
                                   window_size=100,
                                   max_candidate_pool_size=300, prune_to=28)
    index = VamanaIndex.build(params, data, "l2")
    if os.environ.get("SVT_BENCH_QB"):
        index.query_batch_size = int(os.environ["SVT_BENCH_QB"])
    build_s = time.time() - t0
    print(f"# build: {build_s:.1f}s mean_degree={index.graph.mean_degree():.1f}",
          file=sys.stderr)

    if os.environ.get("SVT_BENCH_PACKED", "1") != "0":
        # packed-neighborhood serving: r-fold fewer HBM row gathers/iter
        # (the gather is per-row limited on TPU; see PERF.md)
        t0 = time.time()
        index.enable_packed_serving()
        print(f"# packed neighborhoods: {time.time() - t0:.1f}s",
              file=sys.stderr)

    gt = svt.exhaustive_search(data, queries, k)

    best = None
    for window in (10, 16, 20, 24, 26, 28, 32, 48, 64, 96, 128):
        index.search_window_size = window
        res = index.search(queries, k)       # warm compile + measure recall
        recall = svt.k_recall_at_n(gt, res)
        # steady-state timing: best of two passes (the remote-TPU tunnel has
        # run-to-run latency variance; best-of is the stabler estimator)
        reps = 3
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            for _ in range(reps):
                index.search(queries, k)
            qps = max(qps, nq * reps / (time.time() - t0))
        print(f"# window={window} recall@10={recall:.4f} qps={qps:.0f}",
              file=sys.stderr)
        if recall >= 0.9:
            best = (window, recall, qps)
            break
    if best is None:
        best = (128, recall, qps)

    window, recall, qps = best
    print(json.dumps({
        "metric": f"vamana_qps_at_recall0.9 (n={n}, d={dim}, "
                  f"window={window}, recall={recall:.4f}, "
                  f"build_s={build_s:.1f})",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 4),
        "build_s": round(build_s, 1),
        "recall": round(float(recall), 4),
        "window": window,
    }))


if __name__ == "__main__":
    main()
