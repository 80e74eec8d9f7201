"""Vector compression example: SQ, LVQ, and LeanVec under a Vamana index.

Run: python examples/example_compression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.quantization.leanvec import LeanVecVamana


def main():
    rng = np.random.default_rng(0)
    # anisotropic data (typical of learned embeddings): LeanVec's regime
    basis = np.linalg.qr(rng.normal(size=(128, 128)))[0].astype(np.float32)
    scales = np.geomspace(20, 0.05, 128).astype(np.float32)
    data = ((rng.normal(size=(10_000, 128)) * scales) @ basis
            ).astype(np.float32)
    queries = ((rng.normal(size=(300, 128)) * scales) @ basis
               ).astype(np.float32)
    gt = svt.exhaustive_search(data, queries, 10)
    params = svt.VamanaBuildParameters(graph_max_degree=32, window_size=64)

    def run(name, index, bytes_per_vec):
        index.search_window_size = 40
        recall = svt.k_recall_at_n(gt, index.search(queries, 10))
        print(f"  {name:28s} {bytes_per_vec:4d} B/vec  recall@10={recall:.4f}")

    print("compression sweep (window=40):")
    full = svt.Vamana.build(params, data, svt.L2)
    run("float32 (uncompressed)", full, 128 * 4)

    sq = svt.Vamana.build(params, svt.SQDataset.compress(data), svt.L2)
    run("SQ int8 (global scale)", sq, 128)

    lvq = svt.Vamana.build(params, svt.LVQDataset.compress(data), svt.L2)
    run("LVQ int8 (per-vector)", lvq, 128 + 8)

    lv = LeanVecVamana.build(params, data, svt.L2, target_dim=64,
                             rerank_multiplier=3)
    lv.search_window_size = 40
    recall = svt.k_recall_at_n(gt, lv.search(queries, 10))
    print(f"  {'LeanVec 128->64 + rerank':28s} {64 + 128 + 16:4d} B/vec  "
          f"recall@10={recall:.4f}")


if __name__ == "__main__":
    main()
