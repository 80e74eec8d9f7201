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
    # alpha=1.1: measured optimum on clustered synthetic data with honest
    # (deduped) build pools — see PERF.md round-2 findings
    params = VamanaBuildParameters(graph_max_degree=24, window_size=48,
                                   alpha=1.1)
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

    def test_visited_filter(self, built_index, small_dataset, rng):
        """Opt-in cross-iteration visited filter (reference filter.h:46):
        exact on a complete graph, recall-neutral on a built graph."""
        # complete graph: one expansion reaches all nodes; the filter must
        # not drop anything needed for exactness
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
                            distance="l2", visited_size=256)
        gt = exhaustive_search(x, q, 10)
        np.testing.assert_array_equal(np.asarray(out.ids[:4, :10]), gt.ids)

        # built graph through the index surface: visited_set toggles the
        # filter via search parameters; recall must not regress
        data2, queries = small_dataset
        idx = built_index
        gt2 = exhaustive_search(data2, queries, 10)
        idx.search_window_size = 24
        base = k_recall_at_n(gt2, idx.search(queries, 10))
        import dataclasses
        params_on = dataclasses.replace(idx.search_parameters,
                                        visited_set=True)
        filt = k_recall_at_n(
            gt2, idx.search(queries, 10, parameters=params_on))
        assert filt >= base - 0.01

    def test_tail_compaction_exact(self, built_index, small_dataset):
        """tail_frac > 1 must be bit-identical to the single-loop path:
        converged queries no-op in the full loop, so freezing them and
        compacting the stragglers changes no per-query arithmetic."""
        data, queries = small_dataset
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        idx = built_index
        q = jnp.asarray(pad_matrix(queries[:64].astype(np.float32),
                                   d_pad=idx.data.padded_dim))
        entry = jnp.asarray([idx.entry_point], dtype=jnp.int32)
        kw = dict(window=24, capacity=24, max_iters=64, distance="l2",
                  pop_width=4)
        base = greedy_search(idx.graph, idx.data, q, entry, **kw)
        tail = greedy_search(idx.graph, idx.data, q, entry, tail_frac=4,
                             **kw)
        np.testing.assert_array_equal(np.asarray(base.ids),
                                      np.asarray(tail.ids))
        np.testing.assert_array_equal(np.asarray(base.keys),
                                      np.asarray(tail.keys))
        np.testing.assert_array_equal(np.asarray(base.n_pops),
                                      np.asarray(tail.n_pops))
        # build mode (pool tracking) under compaction: identical pools
        base_p = greedy_search(idx.graph, idx.data, q, entry, pool_size=80,
                               **kw)
        tail_p = greedy_search(idx.graph, idx.data, q, entry, pool_size=80,
                               tail_frac=4, **kw)
        np.testing.assert_array_equal(np.asarray(base_p.pool_ids),
                                      np.asarray(tail_p.pool_ids))

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
        # floors re-based for honest (deduped) build pools at alpha=1.1
        # (measured 0.788 / 0.862 / 0.95; the old crowded-pool graph was an
        # accidental kNN graph, strong on tiny data but broken for MIP)
        floors = {10: 0.75, 20: 0.83, 40: 0.93}
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

    def test_k_exceeds_n(self, small_dataset):
        """k > n must clamp the dispatch width (an unclamped k sizes the
        beam kernel's VMEM off a number with no effect on the answer —
        found by the round-4 TPU verify probe) and pad trailing columns
        with -1 / +inf, like the reference's trailing invalid neighbors."""
        data, queries = small_dataset
        n = 300
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1)
        index = VamanaIndex.build(params, data[:n], "l2",
                                  query_batch_size=16)
        res = index.search(queries[:4], n + 50)
        assert res.ids.shape == (4, n + 50)
        assert np.all(res.ids[:, n:] == -1)
        assert np.all(np.isinf(res.distances[:, n:]))
        valid = res.ids[:, :20]
        assert np.all(valid >= 0)
        # dynamic variant
        from scalablevectorsearch_tpu.index.vamana.dynamic import (
            MutableVamanaIndex)
        dyn = MutableVamanaIndex(params, data[:n], np.arange(n), "l2",
                                 query_batch_size=16)
        res_d = dyn.search(queries[:4], n + 50)
        assert res_d.ids.shape == (4, n + 50)
        assert np.all(res_d.ids[:, n:] == -1)

    def test_sub_k_window(self, built_index, small_dataset):
        """A pop horizon below k is legal: the k results come from the
        final beam, whose capacity floors at k (the reference's
        window/capacity split, search_buffer.h:39).  Sub-k windows must
        return k valid, deduplicated, key-sorted neighbors — recall is the
        caller's tradeoff, validity is not."""
        data, queries = small_dataset
        k = 10
        built_index.search_parameters = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(6, 12))
        res = built_index.search(queries[:16], k)
        assert res.ids.shape == (16, k)
        assert np.all(res.ids >= 0)
        for row in res.ids:
            assert len(set(row.tolist())) == k
        assert np.all(np.diff(res.distances, axis=1) >= -1e-6)
        # wider pop horizon at equal capacity returns equal-or-better
        # best-hits on THIS fixture.  NOTE: lockstep beam search does not
        # guarantee this in general (expansion order and derived max_iters
        # differ) — the assertion is pinned to the fixture/seed; if a seed
        # change breaks it, soften to an aggregate (mean best-hit) check.
        built_index.search_parameters = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(12, 12))
        res_wide = built_index.search(queries[:16], k)
        assert np.all(res_wide.distances[:, 0] <= res.distances[:, 0] + 1e-5)


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
        assert loaded.build_parameters.alpha == 1.1
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

    def test_orchestrator_serving_levers(self, small_dataset):
        """The orchestrator exposes the TPU serving levers (packed
        neighborhoods + entry sampler) by delegation."""
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        v = Vamana.build(params, data, "l2", batch_size=256)
        base = v.search(queries[:16], 5)
        v.enable_packed_serving()
        v.enable_entry_sampler(n_samples=128, seed=0)
        res = v.search(queries[:16], 5)
        assert res.ids.shape == base.ids.shape and (res.ids >= 0).all()
        v.disable_entry_sampler()
        v.disable_packed_serving()
        np.testing.assert_array_equal(v.search(queries[:16], 5).ids,
                                      base.ids)


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


class TestDatasetDtypesEndToEnd:
    """bf16 / int8 datasets driven through the full build+search path
    (VERDICT round-1: no e2e coverage of non-f32 storage)."""

    @pytest.mark.parametrize("dtype,floor", [("bfloat16", 0.70),
                                             ("int8", 0.55)])
    def test_build_and_search(self, small_dataset, dtype, floor):
        data, queries = small_dataset
        if dtype == "int8":
            # quantize into int8 range; queries stay f32
            scale = np.abs(data).max() / 127.0
            stored = np.clip(np.round(data / scale), -127, 127)
            ds = VectorDataset.from_array(stored.astype(np.float32),
                                          dtype=jnp.int8)
            gt = exhaustive_search(stored.astype(np.float32), queries, 10)
        else:
            ds = VectorDataset.from_array(data, dtype=jnp.bfloat16)
            gt = exhaustive_search(data, queries, 10)
        params = VamanaBuildParameters(graph_max_degree=24, window_size=48,
                                       alpha=1.1)
        idx = VamanaIndex.build(params, ds, "l2", batch_size=256)
        idx.search_window_size = 30
        rec = k_recall_at_n(gt, idx.search(queries, 10))
        assert rec >= floor, f"{dtype}: recall {rec}"


class TestFirstPassWindow:
    def test_smaller_first_pass_builds(self, small_dataset):
        """first_pass_window trades pass-1 quality for time; the result must
        still be a sane graph (build.py first_pass_window knob)."""
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=24, window_size=48,
                                       alpha=1.1)
        idx = VamanaIndex.build(params, data, "l2", batch_size=256,
                                first_pass_window=16)
        gt = exhaustive_search(data, queries, 10)
        idx.search_window_size = 40
        rec = k_recall_at_n(gt, idx.search(queries, 10))
        # documented quality trade (PERF.md): pass-2 pools inherit pass-1
        # graph quality, so a 16-wide pass 1 costs real recall — the gate
        # here is "functional and searchable", not parity with full builds
        assert rec >= 0.40
        degs = np.asarray(idx.graph.degrees[:idx.size])
        assert degs.min() >= 1 and degs.max() <= 24


class TestPackedServing:
    def test_packed_matches_unpacked(self, small_dataset):
        """f32 packed neighborhoods return identical results; bf16 packed
        (with exact rerank) stays within recall noise (packed.py)."""
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1, max_candidate_pool_size=80,
                                       prune_to=14)
        idx = VamanaIndex.build(params, data, "l2", batch_size=256)
        idx.search_window_size = 20
        gt = exhaustive_search(data, queries, 10)
        res0 = idx.search(queries, 10)
        r0 = k_recall_at_n(gt, res0)
        idx.enable_packed_serving(dtype=jnp.float32)
        res_f32 = idx.search(queries, 10)
        np.testing.assert_array_equal(res0.ids, res_f32.ids)
        idx.enable_packed_serving(dtype=jnp.bfloat16)
        r_bf16 = k_recall_at_n(gt, idx.search(queries, 10))
        assert r_bf16 >= r0 - 0.02
        idx.disable_packed_serving()
        np.testing.assert_array_equal(idx.search(queries, 10).ids, res0.ids)


class TestEntrySampler:
    def test_sampler_recall_and_validity(self, built_index, small_dataset):
        """Per-query sampled entries (index/vamana/entry.py): recall at
        equal window must not regress vs the medioid entry (measured on
        TPU it IMPROVES — the beam starts inside the query's region), and
        results stay valid/sorted.  Deterministic per seed."""
        data, queries = small_dataset
        gt = exhaustive_search(data, queries, 10)
        built_index.search_window_size = 16
        base = k_recall_at_n(gt, built_index.search(queries, 10))
        built_index.enable_entry_sampler(n_samples=256, seed=0)
        res = built_index.search(queries, 10)
        sampled = k_recall_at_n(gt, res)
        assert sampled >= base - 0.02, (sampled, base)
        assert np.all(res.ids >= 0) and np.all(res.ids < data.shape[0])
        assert np.all(np.diff(res.distances, axis=1) >= -1e-5)
        # deterministic given the seed
        again = built_index.search(queries, 10)
        np.testing.assert_array_equal(res.ids, again.ids)
        built_index.enable_entry_sampler(n_samples=256, n_entries=2, seed=0)
        multi = k_recall_at_n(gt, built_index.search(queries, 10))
        assert multi >= sampled - 0.02
        built_index.disable_entry_sampler()
        back = k_recall_at_n(gt, built_index.search(queries, 10))
        assert back == base

    def test_sampler_persists_through_save(self, tmp_path, built_index,
                                           small_dataset):
        """The sampler config survives save/assemble (a sampled-entries
        graph is only navigable with the sampler on, so reloads must
        re-enable it)."""
        data, queries = small_dataset
        built_index.enable_entry_sampler(n_samples=128, seed=3)
        built_index.save(str(tmp_path / "s"))
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        loaded = VamanaIndex.assemble(str(tmp_path / "s"))
        assert loaded._entry_cfg == {"n_samples": 128, "n_entries": 1,
                                     "seed": 3}
        np.testing.assert_array_equal(loaded.search(queries[:16], 5).ids,
                                      built_index.search(queries[:16], 5).ids)
        # plain saves stay sampler-free on reload
        built_index.disable_entry_sampler()
        built_index.save(str(tmp_path / "p"))
        assert VamanaIndex.assemble(str(tmp_path / "p"))._entry_sampler \
            is None

    def test_sampled_entries_build(self, small_dataset):
        """Building with sampled_entries=True auto-enables the sampler
        (the graph keeps no medioid approach path) and matches the
        medioid-built graph's recall."""
        data, queries = small_dataset
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1)
        gt = exhaustive_search(data, queries, 10)
        base = VamanaIndex.build(params, data, "l2")
        base.search_window_size = 16
        idx = VamanaIndex.build(params, data, "l2", sampled_entries=True,
                                entry_sample_size=256)
        assert idx._entry_sampler is not None     # mandatory, auto-enabled
        idx.search_window_size = 16
        r_base = k_recall_at_n(gt, base.search(queries, 10))
        r_sampled = k_recall_at_n(gt, idx.search(queries, 10))
        assert r_sampled >= r_base - 0.03, (r_sampled, r_base)

    def test_sampler_with_visited_set_and_cancel(self, built_index,
                                                 small_dataset):
        """The sampler composes with the visited filter and the cancel
        hook (both thread through the same fused dispatch)."""
        import dataclasses
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaSearchParameters)
        from scalablevectorsearch_tpu.lib.exceptions import SearchCancelled
        data, queries = small_dataset
        gt = exhaustive_search(data, queries, 10)
        built_index.enable_entry_sampler(n_samples=128, seed=0)
        sp = dataclasses.replace(
            VamanaSearchParameters().with_window(16), visited_set=True)
        res = built_index.search(queries, 10, parameters=sp)
        assert k_recall_at_n(gt, res) >= 0.8
        with pytest.raises(SearchCancelled):
            built_index.search(queries, 10, cancel=lambda: True)
        built_index.disable_entry_sampler()

    def test_sampler_tiny_dataset(self):
        """n < sample floor: the sample is just every row; results exact
        enough for a connected tiny graph."""
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        rng = np.random.default_rng(1)
        x = rng.normal(size=(50, 16)).astype(np.float32)
        idx = VamanaIndex.build(
            VamanaBuildParameters(graph_max_degree=8, window_size=16),
            x, "l2")
        idx.enable_entry_sampler()
        assert idx._entry_cfg["n_samples"] == 1024   # floor; clipped to n
        assert int(idx._entry_sampler.ids.shape[0]) == 50
        res = idx.search(x[:5], 1)
        np.testing.assert_array_equal(res.ids[:, 0], np.arange(5))

    def test_auto_sample_size(self):
        """auto_samples hits the measured optima at both ends (PERF.md:
        100k -> 1024, 10M -> 65536 cap) and is what n_samples=None uses."""
        from scalablevectorsearch_tpu.index.vamana.entry import auto_samples
        assert auto_samples(1_000) == 1024
        assert auto_samples(100_000) == 1024
        assert auto_samples(1_000_000) == 7812
        assert auto_samples(10_000_000) == 65536
        assert auto_samples(1_000_000_000) == 65536

    def test_sampler_selects_nearest(self, rng):
        """EntrySampler.select returns the key-nearest sampled id per query
        for every metric; -1 slots are never selected."""
        from scalablevectorsearch_tpu.index.vamana.entry import build_sampler
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        from scalablevectorsearch_tpu.ops import distance as dist_ops
        x = rng.normal(size=(200, 24)).astype(np.float32)
        data = VectorDataset.from_array(x)
        q = rng.normal(size=(16, 24)).astype(np.float32)
        qp = jnp.asarray(pad_matrix(q, d_pad=data.padded_dim))
        for metric in ("l2", "mip", "cosine"):
            d = dist_ops.as_distance(metric)
            s = build_sampler(data, 64, seed=1)
            got = np.asarray(s.select(d, qp))[:, 0]
            sample_ids = np.asarray(s.ids)
            keys = np.asarray(dist_ops.pairwise_keys(
                d, qp, s.vectors, vector_norms_sq=s.norms_sq))
            expect = sample_ids[np.argmin(keys, axis=1)]
            np.testing.assert_array_equal(got, expect)
            # masked slots are never selected
            import dataclasses
            masked = dataclasses.replace(
                s, ids=jnp.where(jnp.arange(64) < 60, -1, s.ids))
            got2 = np.asarray(masked.select(d, qp))[:, 0]
            assert np.all(np.isin(got2, sample_ids[60:]))

    def test_chunked_select_matches_one_shot(self, rng, monkeypatch):
        """Large samples fold the (B, S) select panel over SELECT_CHUNK
        slices; results are bit-equal to the one-shot argmin (incl. -1
        slots, non-dividing chunk boundaries, and an `invalid` mask)."""
        from scalablevectorsearch_tpu.index.vamana import entry
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        from scalablevectorsearch_tpu.ops import distance as dist_ops
        x = rng.normal(size=(500, 24)).astype(np.float32)
        data = VectorDataset.from_array(x)
        q = rng.normal(size=(16, 24)).astype(np.float32)
        qp = jnp.asarray(pad_matrix(q, d_pad=data.padded_dim))
        s = entry.build_sampler(data, 300, seed=3)
        invalid = jnp.asarray(rng.random(300) < 0.3)
        for metric in ("l2", "mip", "cosine"):
            d = dist_ops.as_distance(metric)
            one_shot = np.asarray(s.select(d, qp, invalid=invalid))
            # force the chunked path with a chunk that does NOT divide S
            monkeypatch.setattr(entry, "SELECT_CHUNK", 128)
            chunked = np.asarray(s.select(d, qp, invalid=invalid))
            monkeypatch.setattr(entry, "SELECT_CHUNK", 8192)
            np.testing.assert_array_equal(one_shot, chunked)

    def test_chunked_select_multi_entry(self, rng, monkeypatch):
        """n_entries > 1 selects the same entry SET through the chunked
        running-merge fold as through the one-shot top_k panel (ordering
        may differ only on exact key ties)."""
        from scalablevectorsearch_tpu.index.vamana import entry
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
        from scalablevectorsearch_tpu.ops import distance as dist_ops
        x = rng.normal(size=(500, 24)).astype(np.float32)
        data = VectorDataset.from_array(x)
        q = rng.normal(size=(16, 24)).astype(np.float32)
        qp = jnp.asarray(pad_matrix(q, d_pad=data.padded_dim))
        s = entry.build_sampler(data, 300, seed=3)
        invalid = jnp.asarray(rng.random(300) < 0.3)
        for metric in ("l2", "mip", "cosine"):
            d = dist_ops.as_distance(metric)
            one_shot = np.asarray(s.select(d, qp, n_entries=4,
                                           invalid=invalid))
            monkeypatch.setattr(entry, "SELECT_CHUNK", 128)
            chunked = np.asarray(s.select(d, qp, n_entries=4,
                                          invalid=invalid))
            monkeypatch.setattr(entry, "SELECT_CHUNK", 8192)
            assert one_shot.shape == chunked.shape == (16, 4)
            np.testing.assert_array_equal(np.sort(one_shot, axis=1),
                                          np.sort(chunked, axis=1))


class TestReferenceInterop:
    """Reference checkpoint-directory interop (svs_config.toml + .svs blobs;
    utils/svs_interop.py)."""

    def test_reference_layout_roundtrip(self, tmp_path, built_index,
                                        small_dataset):
        from scalablevectorsearch_tpu.utils import svs_interop
        data, queries = small_dataset
        built_index.search_window_size = 20
        cfg = str(tmp_path / "cfg")
        gdir = str(tmp_path / "graph")
        ddir = str(tmp_path / "data")
        svs_interop.save_reference_vamana(built_index, cfg, gdir, ddir)
        assert (tmp_path / "cfg" / "svs_config.toml").exists()
        # the reference resolves blobs by matching the config uuid against
        # the blob HEADER uuid (io::find_uuid) — assert they agree
        import tomllib
        from scalablevectorsearch_tpu.core import io as svio
        for d, blob in ((gdir, "graph.svs"), (ddir, "data.svs")):
            with open(f"{d}/svs_config.toml", "rb") as f:
                cfg_uuid = tomllib.load(f)["object"]["uuid"]
            assert svio.read_svs_uuid(f"{d}/{blob}") == cfg_uuid
        loaded = svs_interop.load_reference_vamana(cfg, gdir, ddir, "l2")
        assert loaded.entry_point == built_index.entry_point
        assert loaded.build_parameters.alpha == pytest.approx(1.1)
        assert loaded.search_window_size == 20
        a = built_index.search(queries[:16], 10)
        b = loaded.search(queries[:16], 10)
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_allclose(a.distances, b.distances, rtol=1e-5)

    def test_parses_reference_shipped_config(self):
        """The actual upstream-shipped config parses (field names/nesting)."""
        import os
        from scalablevectorsearch_tpu.utils import svs_interop
        path = "/root/reference/data/test_dataset"
        if not os.path.exists(os.path.join(path, "vamana_config.toml")):
            pytest.skip("reference checkout not present")
        import tomllib
        with open(os.path.join(path, "vamana_config.toml"), "rb") as f:
            table = tomllib.load(f)["object"]
        assert table["__schema__"] == "vamana_index_parameters"
        assert table["build_parameters"]["graph_max_degree"] == 128
        # the shipped ivf_clustering dir is a full svs_config.toml object
        t2 = svs_interop.load_config(os.path.join(path, "ivf_clustering"))
        assert t2["centroids"]["__schema__"] == "uncompressed_data"


class TestServingDispatch:
    def test_batch_plan_equalizes(self):
        from scalablevectorsearch_tpu.index.vamana.index import _BatchPlan
        p = _BatchPlan.plan(5000, 2048)
        assert p.n_batches == 3 and p.rows == 1672      # not 2048+2048+904
        assert p.rows * p.n_batches >= 5000
        p = _BatchPlan.plan(1, 2048)
        assert p.n_batches == 1 and p.rows == 8
        p = _BatchPlan.plan(2048, 2048)
        assert p.n_batches == 1 and p.rows == 2048
        p = _BatchPlan.plan(2049, 2048)
        assert p.n_batches == 2 and p.rows % 8 == 0
        assert p.rows * p.n_batches >= 2049

    def test_query_upload_dtype_knob(self, small_dataset, monkeypatch):
        """float16 is the default transfer dtype; float32 restores exact
        full-precision uploads; both must stay above the recall gate."""
        import scalablevectorsearch_tpu as svt
        from scalablevectorsearch_tpu.index.vamana.index import (
            query_upload_dtype)
        data, queries = small_dataset
        assert query_upload_dtype() == np.float16
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "float32")
        assert query_upload_dtype() == np.float32

        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        index = svt.VamanaIndex.build(params, data[:400], "l2")
        gt = svt.exhaustive_search(data[:400], queries[:64], 5)
        r32 = index.search(queries[:64], 5)
        monkeypatch.delenv("SVT_QUERY_UPLOAD_DTYPE")
        r16 = index.search(queries[:64], 5)
        rec32 = svt.k_recall_at_n(gt, r32)
        rec16 = svt.k_recall_at_n(gt, r16)
        assert rec32 >= 0.85 and rec16 >= rec32 - 0.02, (rec32, rec16)

    def test_int8_query_upload(self, small_dataset, monkeypatch):
        """SVT_QUERY_UPLOAD_DTYPE=int8: per-query max-abs/127 scaled codes,
        dequantized on device inside the fused dispatch.  Opt-in Pareto
        point: +39% e2e QPS at the recall>=0.9 operating point on the real
        chip, with a real recall ceiling from the noisy-query traversal
        (PERF.md round 5)."""
        import scalablevectorsearch_tpu as svt
        from scalablevectorsearch_tpu.index.vamana.index import (
            prepare_query_upload)
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        index = svt.VamanaIndex.build(params, data[:400], "l2")
        gt = svt.exhaustive_search(data[:400], queries[:64], 5)
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "int8")
        res_env = index.search(queries[:64], 5)
        rec8 = svt.k_recall_at_n(gt, res_env)
        assert rec8 >= 0.80, rec8   # noisy-query traversal: looser gate
        # per-index attribute override == env knob, bit-identical
        monkeypatch.delenv("SVT_QUERY_UPLOAD_DTYPE")
        index.query_upload_dtype = "int8"
        res_attr = index.search(queries[:64], 5)
        np.testing.assert_array_equal(res_attr.ids, res_env.ids)
        index.query_upload_dtype = None
        # codes*scale reconstruct within half a quantization step (the
        # "int8" argument exercises the per-index override parameter)
        q = np.asarray(queries[:16], dtype=np.float32)
        codes, scale = prepare_query_upload(q, "int8")
        assert codes.dtype == np.int8 and scale.shape == (16, 1)
        np.testing.assert_allclose(codes.astype(np.float32) * scale, q,
                                   atol=float(scale.max()) * 0.51)
        # all-zero rows (host-side batch padding) must not divide by zero
        z = np.zeros((4, q.shape[1]), dtype=np.float32)
        codes_z, scale_z = prepare_query_upload(z, "int8")
        assert np.all(codes_z == 0) and np.all(scale_z == 1.0)

    def test_host_rerank(self, small_dataset, monkeypatch):
        """enable_host_rerank: the returned beam is re-scored exactly on the
        host (where the f32 query lives) — recovers the final-ranking
        recall int8 uploads lose on device at zero extra upload bytes, and
        the returned distances become EXACT (PERF.md round 5)."""
        import scalablevectorsearch_tpu as svt
        data, queries = small_dataset
        X = np.asarray(data[:400], np.float32)
        Q = np.asarray(queries[:64], np.float32)
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        index = svt.VamanaIndex.build(params, X, "l2")
        gt = svt.exhaustive_search(X, Q, 5)
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "int8")
        index.search_window_size = 12
        rec_plain = svt.k_recall_at_n(gt, index.search(Q, 5))
        with np.testing.assert_raises(ValueError):
            index.enable_host_rerank(X[:100])         # row-count mismatch
        index.enable_host_rerank(X)
        res = index.search(Q, 5)
        rec = svt.k_recall_at_n(gt, res)
        assert rec >= rec_plain - 1e-9, (rec_plain, rec)
        # reranked distances are exact squared L2 for the returned ids
        d_exact = np.sum((X[np.maximum(res.ids, 0)] - Q[:, None, :]) ** 2,
                         axis=-1)
        np.testing.assert_allclose(res.distances, d_exact, rtol=2e-4,
                                   atol=1e-2)
        index.disable_host_rerank()
        assert index._host_rerank is None

    def test_search_async_matches_search(self, built_index, small_dataset):
        """Pipelined serving: in-flight PendingSearch results are identical
        to blocking search(); several overlapping calls don't interfere."""
        _data, queries = small_dataset
        ref = built_index.search(queries[:100], 10)
        handles = [built_index.search_async(queries[:100], 10)
                   for _ in range(3)]
        for h in handles:
            out = h.result()
            np.testing.assert_array_equal(out.ids, ref.ids)
            np.testing.assert_allclose(out.distances, ref.distances,
                                       rtol=1e-6)

    def test_f16_upload_overflow_falls_back_to_f32(self, built_index,
                                                   small_dataset):
        """Query values beyond float16 range (65504) must not be cast to
        inf: the upload helper falls back to full-width for such sets."""
        from scalablevectorsearch_tpu.index.vamana.index import (
            upload_dtype_for)
        data, queries = small_dataset
        big = np.asarray(queries[:8], dtype=np.float32) * 1e6
        assert upload_dtype_for(big) == np.float32
        assert upload_dtype_for(np.asarray(queries[:8])) == np.float16
        out = built_index.search(big, 5)
        assert np.all(np.isfinite(out.distances)), out.distances
        assert np.all(out.ids >= 0)


class TestSaveHost:
    def test_save_host_matches_save(self, tmp_path, built_index,
                                    small_dataset):
        """save_host (dataset from the host array, adjacency streamed in
        chunks — no multi-GB device readback) must produce a checkpoint
        that serves bit-identically to save()."""
        data, queries = small_dataset
        built_index.save(str(tmp_path / "dev"))
        built_index.save_host(str(tmp_path / "host"), data)
        a = VamanaIndex.assemble(str(tmp_path / "dev"))
        b = VamanaIndex.assemble(str(tmp_path / "host"))
        ra = a.search(queries[:32], 10)
        rb = b.search(queries[:32], 10)
        np.testing.assert_array_equal(ra.ids, rb.ids)
        np.testing.assert_allclose(ra.distances, rb.distances, rtol=1e-6)

    def test_save_host_rejects_wrong_rows(self, tmp_path, built_index,
                                          small_dataset):
        data, _ = small_dataset
        with pytest.raises(ValueError):
            built_index.save_host(str(tmp_path / "bad"), data[:-1])
