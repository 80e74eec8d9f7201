"""Inverted index tests (mirrors tests/integration/inverted/build.cpp)."""

import numpy as np
import pytest

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.index.inverted.index import (
    InvertedBuildParameters, InvertedIndex, InvertedSearchParameters)
from scalablevectorsearch_tpu.index.vamana.params import VamanaBuildParameters
from scalablevectorsearch_tpu.orchestrators.inverted import Inverted


@pytest.fixture(scope="module")
def built():
    from scalablevectorsearch_tpu.core.io import generate_test_dataset
    data, queries = generate_test_dataset(4000, 150, 32, seed=41)
    params = InvertedBuildParameters(
        percent_centroids=0.10,
        primary_parameters=VamanaBuildParameters(graph_max_degree=16,
                                                 window_size=32))
    index = InvertedIndex.build(params, data, "l2")
    gt = svt.exhaustive_search(data, queries, 10)
    return index, data, queries, gt


class TestInvertedIndex:
    def test_structure(self, built):
        index, data, queries, gt = built
        assert index.num_centroids == 400
        assert index.size == 4000
        # every point appears exactly once in posting lists
        ids = np.asarray(index.ids_padded)
        live = ids[ids >= 0]
        assert live.size == 4000
        assert len(np.unique(live)) == 4000

    def test_recall_improves_with_epsilon(self, built):
        index, data, queries, gt = built
        prev = 0.0
        for eps, floor in [(0.5, 0.65), (2.0, 0.80), (8.0, 0.82)]:
            res = index.search(queries, 10, InvertedSearchParameters(
                primary_window_size=32, refinement_epsilon=eps,
                max_probes=16))
            rec = svt.k_recall_at_n(gt, res)
            assert rec >= floor, f"eps={eps}: {rec}"
            assert rec >= prev - 0.02
            prev = rec

    def test_save_assemble(self, tmp_path, built):
        index, data, queries, gt = built
        index.save(str(tmp_path / "inv"))
        loaded = InvertedIndex.assemble(str(tmp_path / "inv"))
        a = index.search(queries[:16], 5)
        b = loaded.search(queries[:16], 5)
        np.testing.assert_array_equal(a.ids, b.ids)

    def test_orchestrator(self, built):
        index, data, queries, gt = built
        inv = Inverted(index)
        assert inv.size == 4000 and inv.num_centroids == 400
        res = inv.search(queries[:8], 5)
        assert res.ids.shape == (8, 5)
