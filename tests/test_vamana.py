"""Vamana index integration tests: build quality (recall windows), search
semantics, persistence — the analog of the reference's
tests/integration/vamana/* and bindings/python/tests/test_vamana.py."""

import numpy as np
import pytest
import jax.numpy as jnp

from scalablevectorsearch_tpu import exhaustive_search, k_recall_at_n
from scalablevectorsearch_tpu.core.data import VectorDataset
from scalablevectorsearch_tpu.core.graph import NeighborGraph
from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
from scalablevectorsearch_tpu.index.vamana.params import (
    SearchBufferConfig, VamanaBuildParameters, VamanaSearchParameters)
from scalablevectorsearch_tpu.index.vamana.search import greedy_search
from scalablevectorsearch_tpu.orchestrators.vamana import Vamana


@pytest.fixture(scope="module")
def built_index(small_dataset):
    data, _ = small_dataset
    params = VamanaBuildParameters(graph_max_degree=24, window_size=48,
                                   alpha=1.2)
    return VamanaIndex.build(params, data, "l2", batch_size=256)


class TestGreedySearch:
    def test_exhaustive_on_complete_graph(self, rng):
        """On a fully-connected graph, one expansion reaches every node, so
        greedy search must return the exact nearest neighbors."""
        n, d = 60, 16
        x = rng.normal(size=(n, d)).astype(np.float32)
        data = VectorDataset.from_array(x)
        adj = np.stack([np.delete(np.arange(n), i) for i in range(n)])
        graph = NeighborGraph.from_array(adj.astype(np.int32))
        q = rng.normal(size=(4, d)).astype(np.float32)
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        out = greedy_search(graph, data, jnp.asarray(pad_matrix(q)),
                            jnp.asarray([0], dtype=jnp.int32),
                            window=64, capacity=64, max_iters=200,
                            distance="l2")
        gt = exhaustive_search(x, q, 10)
        np.testing.assert_array_equal(np.asarray(out.ids[:4, :10]), gt.ids)

    def test_window_larger_than_graph_terminates(self, rng):
        x = rng.normal(size=(10, 8)).astype(np.float32)
        data = VectorDataset.from_array(x)
        adj = np.stack([np.delete(np.arange(10), i) for i in range(10)])
        graph = NeighborGraph.from_array(adj.astype(np.int32))
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        out = greedy_search(graph, data,
                            jnp.asarray(pad_matrix(x[:2])),
                            jnp.asarray([0], dtype=jnp.int32),
                            window=32, capacity=32, max_iters=100,
                            distance="l2")
        assert int(out.n_iters) <= 11  # pops bounded by graph size
        # searching for a dataset vector finds it at distance ~0
        assert np.asarray(out.keys)[0, 0] < 1e-3


class TestVamanaBuild:
    def test_recall_windows(self, built_index, small_dataset):
        """Recall must improve with window size and clear per-window floors
        (the reference asserts recall-in-epsilon per config; we assert
        conservative lower bounds)."""
        data, queries = small_dataset
        gt = exhaustive_search(data, queries, 10)
        floors = {10: 0.78, 20: 0.88, 40: 0.96}
        prev = 0.0
        for w, floor in floors.items():
            built_index.search_window_size = w
            rec = k_recall_at_n(gt, built_index.search(queries, 10))
            assert rec >= floor, f"window {w}: recall {rec} < floor {floor}"
            assert rec >= prev - 0.02
            prev = rec

    def test_degrees_within_bounds(self, built_index):
        degs = np.asarray(built_index.graph.degrees[:built_index.size])
        assert degs.max() <= built_index.graph.max_degree
        assert degs.min() >= 1
        adj = built_index.graph.to_numpy()
        # no self-loops; padding only past the degree
        for i in [0, 17, 100]:
            row = adj[i]
            d = degs[i]
            assert (row[:d] != i).all()
            assert (row[:d] >= 0).all()
            assert (row[d:] == -1).all()
            # no duplicate neighbors
            assert len(set(row[:d].tolist())) == d

    def test_mip_build(self, small_dataset):
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=24, window_size=48)
        idx = VamanaIndex.build(params, data, "mip", batch_size=256)
        gt = exhaustive_search(data, queries, 10, distance="mip")
        idx.search_window_size = 30
        rec = k_recall_at_n(gt, idx.search(queries, 10))
        assert rec >= 0.75

    def test_alpha_validation(self):
        with pytest.raises(ValueError):
            VamanaBuildParameters(alpha=0.9).resolved("l2")
        with pytest.raises(ValueError):
            VamanaBuildParameters(alpha=1.1).resolved("mip")
        p = VamanaBuildParameters().resolved("l2")
        assert p.alpha == 1.2 and p.prune_to == 28
        assert p.max_candidate_pool_size == 3 * p.window_size
        p2 = VamanaBuildParameters(graph_max_degree=8).resolved("mip")
        assert p2.alpha == 0.95 and p2.prune_to == 8


class TestVamanaSearch:
    def test_k_larger_than_window(self, built_index, small_dataset):
        data, queries = small_dataset
        built_index.search_window_size = 4
        res = built_index.search(queries[:8], 20)  # k forces window up
        assert (res.ids >= 0).mean() > 0.95

    def test_single_query_vector(self, built_index, small_dataset):
        data, queries = small_dataset
        res = built_index.search(queries[0], 5)
        assert res.ids.shape == (1, 5)

    def test_dim_mismatch(self, built_index):
        with pytest.raises(ValueError):
            built_index.search(np.zeros((2, 7), np.float32), 3)

    def test_reconstruct(self, built_index, small_dataset):
        data, _ = small_dataset
        got = built_index.reconstruct_at([3, 9])
        np.testing.assert_allclose(got, data[[3, 9]], rtol=1e-5)
        with pytest.raises(IndexError):
            built_index.reconstruct_at([built_index.size])

    def test_search_params_plumbing(self, built_index):
        p = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(16, 32))
        built_index.search_parameters = p
        assert built_index.search_window_size == 16
        assert built_index.search_parameters.buffer_config\
            .search_buffer_capacity == 32


class TestVamanaPersistence:
    def test_save_assemble_identical(self, tmp_path, built_index,
                                     small_dataset):
        data, queries = small_dataset
        built_index.search_window_size = 20
        built_index.save(str(tmp_path / "idx"))
        loaded = VamanaIndex.assemble(str(tmp_path / "idx"))
        assert loaded.entry_point == built_index.entry_point
        assert loaded.distance == built_index.distance
        assert loaded.search_window_size == 20
        assert loaded.build_parameters.alpha == 1.2
        a = built_index.search(queries[:32], 10)
        b = loaded.search(queries[:32], 10)
        np.testing.assert_array_equal(a.ids, b.ids)

    def test_orchestrator_roundtrip(self, tmp_path, small_dataset):
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        v = Vamana.build(params, data, "l2", batch_size=256)
        assert v.size == data.shape[0]
        assert v.graph_max_degree == 16
        v.save(str(tmp_path / "v"))
        v2 = Vamana.assemble(str(tmp_path / "v"))
        r1 = v.search(queries[:8], 5)
        r2 = v2.search(queries[:8], 5)
        np.testing.assert_array_equal(r1.ids, r2.ids)


class TestStreamAndDistance:
    def test_stream_roundtrip(self, tmp_path, built_index, small_dataset):
        import io
        data, queries = small_dataset
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        buf = io.BytesIO()
        built_index.save_stream(buf)
        buf.seek(0)
        loaded = VamanaIndex.assemble_stream(buf)
        a = built_index.search(queries[:8], 5)
        b = loaded.search(queries[:8], 5)
        np.testing.assert_array_equal(a.ids, b.ids)

    def test_get_distance(self, built_index, small_dataset):
        data, queries = small_dataset
        v = Vamana(built_index)
        d = v.get_distance(7, queries[0])
        want = ((queries[0] - data[7]) ** 2).sum()
        assert abs(d - want) / want < 1e-4
