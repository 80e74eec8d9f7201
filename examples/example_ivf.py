"""IVF example: k-means clustering, assembly, probe sweep, compressed
postings with reranking.

Run: python examples/example_ivf.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.index.ivf.params import IVFSearchParameters


def main():
    data, queries = svt.generate_test_dataset(20_000, 500, 96, seed=5)
    gt = svt.exhaustive_search(data, queries, 10)

    # --- train clustering once, assemble many ways (reference workflow) ----
    params = svt.IVFBuildParameters(num_centroids=256, minibatch_size=5000,
                                    num_iterations=8, training_fraction=0.5)
    clustering = svt.Clustering.build(params, data)
    print("clusters:", clustering.num_centroids,
          "max size:", int(clustering.cluster_sizes().max()))

    index = svt.IVF.assemble_from_clustering(clustering, data, svt.L2)
    for probes in (2, 8, 32):
        index.n_probes = probes
        recall = svt.k_recall_at_n(gt, index.search(queries, 10))
        print(f"  n_probes={probes:3d}  recall@10={recall:.4f}")

    # --- LVQ-compressed posting lists + full-precision rerank --------------
    from scalablevectorsearch_tpu.index.ivf.index import IVFIndex
    from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
    compressed = IVFIndex.assemble_from_clustering(
        clustering, data, svt.L2, dataset_cls=LVQDataset, rerank=True)
    res = compressed.search(queries, 10,
                            IVFSearchParameters(n_probes=16, k_reorder=3))
    print(f"LVQ postings + rerank recall@10: "
          f"{svt.k_recall_at_n(gt, res):.4f}")


if __name__ == "__main__":
    main()
