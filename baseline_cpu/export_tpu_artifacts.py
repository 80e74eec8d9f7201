#!/usr/bin/env python
"""Export the CPU-anchor inputs (runs ON the TPU platform).

Writes flat binaries under baseline_cpu/.artifacts/ (gitignored):

  data100k.bin / queries100k.bin / gt100k.bin   bench 100k operating point
                                                (seed 42, 5000 queries)
  data1m.bin / queries1m.bin / gt1m.bin         bench 1M operating point
                                                (seed 7, 2000 queries)
  graph1m.bin                                   OUR TPU-built 1M Vamana
                                                graph (same params as
                                                bench's 1M phase)

The CPU baseline then searches the SAME graph/queries/ground truth the TPU
serves, so its QPS-at-equal-recall is a true same-operating-point anchor
(BASELINE.md).  Ground truths are computed exactly (f32 flat scan) on the
TPU.
"""

import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

import scalablevectorsearch_tpu as svt  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex  # noqa: E402
from scalablevectorsearch_tpu.index.vamana.params import (  # noqa: E402
    VamanaBuildParameters)

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".artifacts")


def log(m):
    print(m, file=sys.stderr, flush=True)


def write_f32(path, m):
    m = np.ascontiguousarray(m, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", m.shape[0], m.shape[1]))
        f.write(m.tobytes())


def write_i32(path, m):
    m = np.ascontiguousarray(m, np.int32)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", m.shape[0], m.shape[1]))
        f.write(m.tobytes())


def export_scale(tag, n, nq, seed, k=10, build=False):
    data, queries = svt.generate_test_dataset(n, nq, 128, seed=seed)
    x = np.asarray(data, np.float32)
    write_f32(os.path.join(ART, f"data{tag}.bin"), x)
    write_f32(os.path.join(ART, f"queries{tag}.bin"), queries)
    t0 = time.time()
    gt = np.asarray(svt.exhaustive_search(x, queries, k).ids)
    log(f"{tag} gt: {time.time() - t0:.1f}s")
    write_i32(os.path.join(ART, f"gt{tag}.bin"), gt)
    if build:
        params = VamanaBuildParameters(
            alpha=1.1, graph_max_degree=32, window_size=100,
            max_candidate_pool_size=300, prune_to=28)
        t0 = time.time()
        # medoid entry (sampled_entries=False): the CPU searcher enters at
        # the medoid, so the exported graph must be medoid-navigable
        index = VamanaIndex.build(params, x, "l2")
        log(f"{tag} TPU build: {time.time() - t0:.1f}s "
            f"(single-chip, medoid entry)")
        from scalablevectorsearch_tpu.lib.transfer import to_host_chunked
        adj = to_host_chunked(index.graph.adjacency)[: index.graph.n]
        write_i32(os.path.join(ART, f"graph{tag}.bin"), adj)


def main():
    os.makedirs(ART, exist_ok=True)
    export_scale("100k", 100_000, 5000, seed=42)
    export_scale("1m", 1_000_000, 2000, seed=7, build=True)
    log("export complete")


if __name__ == "__main__":
    main()
