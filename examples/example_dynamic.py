"""Dynamic index example: add / delete / consolidate / compact.

Run: python examples/example_dynamic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scalablevectorsearch_tpu as svt


def main():
    data, queries = svt.generate_test_dataset(8_000, 200, 64, seed=7)

    params = svt.VamanaBuildParameters(graph_max_degree=32, window_size=64)
    index = svt.DynamicVamana.build(params, data[:6000],
                                    np.arange(6000), svt.L2)
    index.search_window_size = 40
    print("initial size:", index.size)

    # stream in new points under fresh external ids
    index.add_points(data[6000:7000], np.arange(6000, 7000))
    # retire old ones
    index.delete_points(np.arange(0, 500))
    print("after add+delete:", index.size)

    res = index.search(queries, 10)
    assert not np.isin(res.ids, np.arange(500)).any(), "deleted id surfaced!"

    # consolidate rewires the graph around deleted nodes; compact densifies
    index.consolidate().compact()
    live = np.sort(index.all_ids())
    gt = svt.exhaustive_search(data[live], queries, 10)
    recall = svt.k_recall_at_n(live[gt.ids], index.search(queries, 10))
    print(f"post-consolidate recall@10: {recall:.4f}")


if __name__ == "__main__":
    main()
