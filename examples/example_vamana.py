"""End-to-end Vamana example: build, search, calibrate, persist.

The TPU-native analog of the reference's examples/python/example_vamana.py.
Run: python examples/example_vamana.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scalablevectorsearch_tpu as svt


def main():
    # --- data ---------------------------------------------------------------
    data, queries = svt.generate_test_dataset(10_000, 500, 128, seed=1234)
    gt = svt.exhaustive_search(data, queries, 10)

    # --- build ---------------------------------------------------------------
    params = svt.VamanaBuildParameters(
        alpha=1.2, graph_max_degree=32, window_size=100,
        max_candidate_pool_size=250, prune_to=28)
    index = svt.Vamana.build(params, data, svt.L2)
    print(f"built: {index.size} points, R={index.graph_max_degree}")

    # --- recall sweep -----------------------------------------------------------
    # expected recall@10 on this deterministic dataset (see
    # data/golden/vamana_reference.json; regenerate with the
    # vamana_test_generator benchmark executable)
    for window in (10, 20, 30, 40):
        index.search_window_size = window
        recall = svt.k_recall_at_n(gt, index.search(queries, 10))
        print(f"  window={window:3d}  recall@10={recall:.4f}")

    # --- calibration ---------------------------------------------------------------
    calibrated = svt.calibrate(index.index, queries, gt.ids, 10,
                               target_recall=0.95)
    print(f"calibrated window for recall>=0.95: "
          f"{calibrated.buffer_config.search_window_size}")

    # --- persistence -----------------------------------------------------------------
    with tempfile.TemporaryDirectory() as tmp:
        index.save(tmp)
        reloaded = svt.Vamana.assemble(tmp)
        assert (reloaded.search(queries[:8], 5).ids
                == index.search(queries[:8], 5).ids).all()
        print("save/assemble roundtrip OK")


if __name__ == "__main__":
    main()
