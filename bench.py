#!/usr/bin/env python
"""Headline benchmark: Vamana QPS at recall@10 >= 0.9.

Builds a Vamana index over a clustered synthetic dataset on the real TPU,
sweeps the search window to find the smallest config reaching recall@10 >= 0.9
against exact (flat) ground truth, and reports steady-state QPS there — then
repeats build + serving at 1M scale in the same (warm) process so the
driver-tracked number covers both scales (BASELINE.md's ≤2x-Xeon 1M build
target).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N,
   "build_s": ..., "latency": {p50/p95/p99}, "scale_1m": {...}}

``vs_baseline`` is measured QPS divided by BASELINE_QPS — a nominal stand-in
for the reference's CPU throughput at the same operating point (the reference
repo publishes no in-tree absolute QPS numbers; see BASELINE.md).

Timing accounting: the axon TPU plugin's FIRST lowering in a process goes
through a remote compile service and costs minutes regardless of program size
(measured one-time and order-independent — PERF.md "Round-3 levers" 1).  That
warm-up is paid up front on a tiny dummy program, overlapped with host-side
dataset generation, and reported separately as ``plugin_warmup_s`` — build_s
then measures what a warm production process pays, which is the number
comparable to the reference's build times.

Environment knobs: SVT_BENCH_N (default 100000), SVT_BENCH_DIM (128),
SVT_BENCH_QUERIES (5000), SVT_BENCH_QB (query batch rows), SVT_BENCH_1M=0
(skip the 1M scale), SVT_BENCH_BUDGET_S (default 2700: skip the 1M phase if
the 100k phase already used more than half the budget), SVT_BENCH_SAMPLER=0
(disable per-query sampled entry points and revert to the medioid entry).
"""

import json
import os
import sys
import threading
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


def _plugin_warmup(out):
    """Absorb the one-time remote-compile cost on a TINY REAL build (runs
    on a background thread, overlapped with dataset gen).

    A trivial matmul does NOT absorb it (measured: 1.3 s warm-up, then the
    100k build still paid ~765 s of first-lowering) — the cost attaches to
    the first substantial lowering in the process, so the warm-up must BE a
    build, at throwaway shapes."""
    t0 = time.time()
    data, _ = svt.generate_test_dataset(2048, 8, 32, seed=1)
    params = VamanaBuildParameters(alpha=1.2, graph_max_degree=16,
                                   window_size=32,
                                   max_candidate_pool_size=64, prune_to=14)
    svt.VamanaIndex.build(params, data, "l2")
    out["warmup_s"] = time.time() - t0


def _build_and_serve(data, queries, k, alpha, windows, label):
    """Build, pack, sweep windows to recall>=0.9; returns a result dict."""
    sampler_on = os.environ.get("SVT_BENCH_SAMPLER", "1") != "0"
    t0 = time.time()
    params = VamanaBuildParameters(alpha=alpha, graph_max_degree=32,
                                   window_size=100,
                                   max_candidate_pool_size=300, prune_to=28)
    # sampled build entries: ~11% faster builds at equal quality (the
    # graph then REQUIRES sampled-entry serving, which the bench uses
    # anyway; measured 100k 39.5 -> 35.1 s, recall -0.002 at equal w)
    index = VamanaIndex.build(params, data, "l2",
                              sampled_entries=sampler_on)
    if os.environ.get("SVT_BENCH_QB"):
        index.query_batch_size = int(os.environ["SVT_BENCH_QB"])
    # serving pop_width (SVT_BENCH_POPW): e2e QPS measured FLAT across
    # m 4-8 at 100k, but m=8 serves +0.03 recall at equal window
    # (PERF.md round-3 continuation) — the knob lets the driver pick the
    # operating point without code edits
    if os.environ.get("SVT_BENCH_POPW"):
        index.pop_width = int(os.environ["SVT_BENCH_POPW"])
    build_s = time.time() - t0
    print(f"# {label} build: {build_s:.1f}s "
          f"mean_degree={index.graph.mean_degree():.1f}", file=sys.stderr, flush=True)

    if os.environ.get("SVT_BENCH_PACKED", "1") != "0":
        # packed-neighborhood serving: r-fold fewer HBM row gathers/iter
        # (the gather is per-row limited on TPU; see PERF.md)
        t0 = time.time()
        index.enable_packed_serving()
        print(f"# packed neighborhoods: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

    # per-query sampled entry points (auto-enabled by the sampled build):
    # one MXU matmul vs a resident auto-scaled sample replaces the
    # medioid-to-neighborhood walk — ~3x fewer lockstep iterations at
    # BETTER recall (entry.py; measured 100k: medioid w=24 0.903 @ 27.5
    # iters vs sampled w=12 0.924 @ 9.5 iters)

    gt = svt.exhaustive_search(data, queries, k)
    nq = len(queries)

    best = None
    for window in windows:
        index.search_window_size = window
        res = index.search(queries, k)       # warm compile + measure recall
        recall = svt.k_recall_at_n(gt, res)
        # steady-state timing: best of two passes (the remote-TPU tunnel has
        # run-to-run latency variance; best-of is the stabler estimator).
        # Throughput passes pipeline whole search calls (search_async):
        # call N+1's host pad/upload rides the tunnel while call N computes —
        # the TPU analog of the reference's threadpool-saturated QPS
        # measurement (index.h:556-603 partitions one batch across threads;
        # a serving deployment keeps the queue non-empty).
        # reps amortize the pipeline fill (first call's upload + last
        # call's readback): measured 100k/w24 QPS 101.6k at reps=4,
        # 112.8k at 8, 131.4k at 16 vs a 138k no-upload device ceiling
        reps = 10
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            handles = [index.search_async(queries, k) for _ in range(reps)]
            for h in handles:
                h.result()
            qps = max(qps, nq * reps / (time.time() - t0))
        print(f"# {label} window={window} recall@10={recall:.4f} "
              f"qps={qps:.0f}", file=sys.stderr, flush=True)
        if recall >= 0.9:
            best = (window, recall, qps)
            break
    if best is None:
        best = (windows[-1], recall, qps)
    window, recall, qps = best

    # per-batch dispatch latency distribution at the operating point
    # (tail latency is first-class — reference search.h:80,209-218).
    # Equal-size batches only, warmed once: a ragged tail batch would be a
    # fresh static shape and its sample would time a remote compile, not a
    # dispatch.
    qb = min(index.query_batch_size, nq)
    index.search(queries[:qb], k)            # warm this exact shape
    lat = []
    for i in range(min(nq // qb, 16) or 1):
        batch = queries[i * qb: (i + 1) * qb]
        if len(batch) < qb:
            break
        t1 = time.time()
        index.search(batch, k)
        lat.append((time.time() - t1) * 1e6)
    latency = {"p50_us": round(float(np.percentile(lat, 50)), 1),
               "p95_us": round(float(np.percentile(lat, 95)), 1),
               "p99_us": round(float(np.percentile(lat, 99)), 1),
               "batch_queries": min(qb, nq)}
    return {"build_s": round(build_s, 1), "qps": round(qps, 1),
            "recall": round(float(recall), 4), "window": window,
            "latency": latency}


def main():
    started = time.time()
    budget_s = float(os.environ.get("SVT_BENCH_BUDGET_S", 2700))
    warm = {}
    warm_thread = threading.Thread(target=_plugin_warmup, args=(warm,))
    warm_thread.start()

    n = int(os.environ.get("SVT_BENCH_N", 100_000))
    dim = int(os.environ.get("SVT_BENCH_DIM", 128))
    nq = int(os.environ.get("SVT_BENCH_QUERIES", 5000))
    k = 10
    alpha = float(os.environ.get("SVT_BENCH_ALPHA", 1.1))

    data, queries = svt.generate_test_dataset(n, nq, dim, seed=42)
    warm_thread.join()
    print(f"# plugin warm-up (one-time, overlapped with datagen): "
          f"{warm.get('warmup_s', 0):.1f}s", file=sys.stderr, flush=True)

    # sampled entries reach recall 0.9 at roughly half the window of the
    # medioid entry (measured: 100k w=12 vs w=24, see entry.py docstring)
    sampler_on = os.environ.get("SVT_BENCH_SAMPLER", "1") != "0"
    head_windows = (11, 12, 13, 14, 16, 20, 24, 32, 48, 64, 96, 128) \
        if sampler_on else (10, 16, 20, 24, 26, 28, 32, 48, 64, 96, 128)
    head = _build_and_serve(data, queries, k, alpha, head_windows,
                            f"{n // 1000}k")

    scale_1m = None
    elapsed = time.time() - started
    if os.environ.get("SVT_BENCH_1M", "1") != "0" and n < 1_000_000 \
            and elapsed < budget_s / 2:
        data1, queries1 = svt.generate_test_dataset(1_000_000, 2000, dim,
                                                    seed=7)
        # sampled entries with the auto sample (7812 at 1M): w=20 measured
        # recall 0.9677 @ ~100k QPS (S=1024 gave 0.8981 there) — the 0.9
        # knee sits well below, so sweep from w=12
        windows_1m = (12, 13, 14, 15, 16, 18, 20, 24, 32) if sampler_on \
            else (24, 32, 48, 64)
        scale_1m = _build_and_serve(data1, queries1, k, alpha,
                                    windows_1m, "1M")

    out = {
        "metric": f"vamana_qps_at_recall0.9 (n={n}, d={dim}, "
                  f"window={head['window']}, recall={head['recall']:.4f}, "
                  f"build_s={head['build_s']})",
        "value": head["qps"],
        "unit": "qps",
        "vs_baseline": round(head["qps"] / BASELINE_QPS, 4),
        "build_s": head["build_s"],
        "recall": head["recall"],
        "window": head["window"],
        "latency": head["latency"],
        "plugin_warmup_s": round(warm.get("warmup_s", 0.0), 1),
    }
    if scale_1m is not None:
        out["scale_1m"] = scale_1m
    print(json.dumps(out))


if __name__ == "__main__":
    main()
