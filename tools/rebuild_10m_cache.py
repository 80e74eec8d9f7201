#!/usr/bin/env python
"""Rebuild the 10M benchmark cache (.bench10m/) end to end.

The cache (~11 GB, gitignored) makes bench.py's judged Deep-10M phase
serve-only; when it is lost the bench emits {"skipped": "no cache"} until
this script repopulates it.  Contents + measured costs (round 4/5):

  queries.npy / gt.npy   2000 x 96 queries + exhaustive top-10 (f32-exact)
  index/                 Vamana graph + f32 dataset (build ~2270 s on the
                         v5e; saved via save_host — no device readback)
  lvq8x8/                two-level LVQ8x8 codes (host compress ~460 s)
  ivf/                   bf16 super-row posting layout (TPU k-means train
                         ~370 s; packed + saved host-side)

Every step is resumable: artifacts that already exist are skipped, so a
crashed run continues where it stopped.  Run it on the TPU platform:

  python tools/rebuild_10m_cache.py [cache_dir]

Matches the reference's benchmark asset preparation flow
(benchmark/include/svs-benchmark/datasets.h — ground truth + converted
layouts are build-once inputs, not per-run work).
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

import scalablevectorsearch_tpu as svt  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.params import (  # noqa: E402
    VamanaBuildParameters)

N, NQ, DIM, K, SEED = 10_000_000, 2000, 96, 10, 13


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ck = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".bench10m")
    ck = os.path.abspath(ck)
    os.makedirs(ck, exist_ok=True)
    index_dir = os.path.join(ck, "index")
    q_path = os.path.join(ck, "queries.npy")
    gt_path = os.path.join(ck, "gt.npy")

    t0 = time.time()
    data, queries = svt.generate_test_dataset(N, NQ, DIM, seed=SEED)
    x = np.asarray(data, np.float32)
    log(f"datagen: {time.time() - t0:.1f}s")
    np.save(q_path, queries)

    if not os.path.isdir(index_dir):
        t0 = time.time()
        params = VamanaBuildParameters(
            alpha=float(os.environ.get("SVT_BENCH_ALPHA", 1.1)),
            graph_max_degree=32, window_size=100,
            max_candidate_pool_size=300, prune_to=28)
        index = VamanaIndex.build(params, x, "l2", sampled_entries=True)
        build_s = time.time() - t0
        log(f"build: {build_s:.1f}s mean_degree="
            f"{index.graph.mean_degree():.1f}")
        t0 = time.time()
        index.save_host(index_dir, x)
        log(f"save_host: {time.time() - t0:.1f}s")
        del index
        gc.collect()
    else:
        log("index/ exists, skipping build")

    if not os.path.exists(gt_path):
        t0 = time.time()
        gt = np.asarray(svt.exhaustive_search(x, queries, K).ids)
        log(f"exhaustive gt: {time.time() - t0:.1f}s")
        np.save(gt_path, gt)
        gc.collect()
    else:
        log("gt.npy exists, skipping")

    lvq_dir = os.path.join(ck, "lvq8x8")
    if not os.path.isdir(lvq_dir):
        from scalablevectorsearch_tpu.quantization import lvq as lvq_mod
        t0 = time.time()
        lvq_mod.compress_and_save_host(lvq_dir, x, bits=8, residual_bits=8)
        log(f"lvq8x8 compress+save (host): {time.time() - t0:.1f}s")
    else:
        log("lvq8x8/ exists, skipping")

    ivf_dir = os.path.join(ck, "ivf")
    if not os.path.isdir(ivf_dir):
        from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
        from scalablevectorsearch_tpu.index.ivf.index import (
            save_packed_layout_host)
        from scalablevectorsearch_tpu.index.ivf.params import (
            IVFBuildParameters)
        params = IVFBuildParameters(
            num_centroids=max(64, min(16384, int(np.sqrt(N) * 3))),
            num_iterations=10, training_fraction=min(1.0, 200_000 / N),
            is_hierarchical=False).resolved(N)
        t0 = time.time()
        clustering = Clustering.build(params, x)
        log(f"ivf train: {time.time() - t0:.1f}s K={params.num_centroids}")
        t0 = time.time()
        save_packed_layout_host(ivf_dir, clustering, x, "l2",
                                eltype="bfloat16")
        log(f"ivf pack+save (host): {time.time() - t0:.1f}s")
    else:
        log("ivf/ exists, skipping")

    log(f"cache complete at {ck}")


if __name__ == "__main__":
    main()
