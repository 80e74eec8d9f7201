"""Dynamic index tests: add/delete/consolidate/compact cycles with the
ReferenceDataset mutation harness (mirrors the reference's
dynamic_index_2.cpp + utils/characterization/mutable.cpp strategy)."""

import numpy as np
import pytest

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.index.dynamic_flat import DynamicFlatIndex
from scalablevectorsearch_tpu.index.vamana.dynamic import MutableVamanaIndex
from scalablevectorsearch_tpu.index.vamana.params import VamanaBuildParameters
from scalablevectorsearch_tpu.orchestrators.dynamic_vamana import (
    DynamicFlat, DynamicVamana)
from scalablevectorsearch_tpu.utils.dynamic_helper import ReferenceDataset


@pytest.fixture(scope="module")
def pool():
    from scalablevectorsearch_tpu.core.io import generate_test_dataset
    data, queries = generate_test_dataset(3000, 64, 32, seed=31)
    return data, queries


class TestDynamicFlat:
    def test_mutation_cycles_exact(self, pool):
        data, queries = pool
        ref = ReferenceDataset(data, seed=1)
        pts, ids = ref.new_batch(800)
        index = DynamicFlatIndex(pts, ids, "l2", data_batch_size=512)
        assert index.size == 800
        ref.check_recall(index, queries, 10, floor=0.999)  # flat is exact

        for step in range(3):
            pts, ids = ref.new_batch(300)
            index.add_points(pts, ids)
            dead = ref.delete_batch(150)
            index.delete_points(dead)
            ref.check_recall(index, queries, 10, floor=0.999)
        assert index.size == len(ref.live)
        np.testing.assert_array_equal(
            index.all_ids(), np.sort(np.fromiter(ref.live, dtype=np.int64)))

    def test_compact_preserves_results(self, pool):
        data, queries = pool
        ref = ReferenceDataset(data, seed=2)
        pts, ids = ref.new_batch(500)
        index = DynamicFlatIndex(pts, ids, "l2", data_batch_size=512)
        index.delete_points(ref.delete_batch(200))
        before = index.search(queries[:16], 5)
        index.compact()
        after = index.search(queries[:16], 5)
        np.testing.assert_array_equal(before.ids, after.ids)
        assert index.size == 300

    def test_duplicate_external_id_raises(self, pool):
        data, _ = pool
        index = DynamicFlatIndex(data[:10], np.arange(10), "l2")
        with pytest.raises(ValueError):
            index.add_points(data[10:12], [5, 100])


class TestMutableVamana:
    @pytest.fixture(scope="class")
    def built(self, pool):
        data, queries = pool
        ref = ReferenceDataset(data, seed=3)
        pts, ids = ref.new_batch(1200)
        # alpha=1.1: honest-pool optimum on clustered data (PERF.md round 2)
        params = VamanaBuildParameters(graph_max_degree=24,
                                       window_size=48, alpha=1.1)
        index = MutableVamanaIndex(params, pts, ids, "l2")
        index.search_window_size = 40
        return index, ref, queries

    def test_initial_recall(self, built):
        index, ref, queries = built
        rec = ref.check_recall(index, queries, 10, floor=0.85)

    def test_add_delete_consolidate_cycles(self, built):
        index, ref, queries = built
        for step in range(3):
            pts, ids = ref.new_batch(200)
            index.add_points(pts, ids)
            ref.check_recall(index, queries, 10, floor=0.80)
            dead = ref.delete_batch(150)
            index.delete_points(dead)
            # deleted ids must never surface, even before consolidation
            ref.check_recall(index, queries, 10, floor=0.75)
            index.consolidate()
            ref.check_recall(index, queries, 10, floor=0.75)
        assert index.size == len(ref.live)

    def test_search_async_matches_search(self, built):
        index, _ref, queries = built
        ref_out = index.search(queries[:50], 10)
        handles = [index.search_async(queries[:50], 10) for _ in range(2)]
        for h in handles:
            out = h.result()
            np.testing.assert_array_equal(out.ids, ref_out.ids)

    def test_compact_then_search(self, built):
        index, ref, queries = built
        index.compact()
        assert index.size == len(ref.live)
        ref.check_recall(index, queries, 10, floor=0.75)
        np.testing.assert_array_equal(
            index.all_ids(), np.sort(np.fromiter(ref.live, dtype=np.int64)))

    def test_packed_serving_tracks_mutations(self, pool):
        """Packed-neighborhood serving on the dynamic index: mutations that
        rewrite adjacency invalidate the packed array (rebuilt lazily) and
        search results stay consistent with the unpacked path."""
        data, queries = pool
        import jax.numpy as jnp
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1)
        index = MutableVamanaIndex(params, data[:600], np.arange(600), "l2")
        index.search_window_size = 24
        plain = index.search(queries[:32], 5)
        # exact-dtype packing => identical traversal, identical results
        index.enable_packed_serving(dtype=jnp.float32)
        packed = index.search(queries[:32], 5)
        np.testing.assert_array_equal(plain.ids, packed.ids)
        assert index._packed is not None

        # add: invalidates; next search repacks and can reach the new points
        index.add_points(data[600:700], np.arange(600, 700))
        assert index._packed is None
        index.search(queries[:8], 5)
        assert index._packed is not None

        # soft delete does NOT invalidate, but deleted ids never surface
        index.delete_points(np.arange(0, 50))
        assert index._packed is not None
        res = index.search(queries[:32], 5)
        assert not np.isin(res.ids, np.arange(0, 50)).any()

        # consolidate + compact invalidate; results stay sane
        index.consolidate()
        assert index._packed is None
        index.compact()
        res2 = index.search(queries[:32], 5)
        assert (res2.ids >= 0).all()
        assert not np.isin(res2.ids, np.arange(0, 50)).any()

    def test_entry_sampler_tracks_mutations(self, pool):
        """Per-query sampled entries on the dynamic index: every mutation
        invalidates the sample (slot reuse repoints ids; consolidation
        clears deleted rows' adjacency), which is rebuilt lazily from the
        then-current VALID slots; results always exclude deleted ids."""
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1)
        index = MutableVamanaIndex(params, data[:600], np.arange(600), "l2")
        index.search_window_size = 24
        gt = svt.exhaustive_search(data[:600], queries[:32], 5)
        base = svt.k_recall_at_n(gt, index.search(queries[:32], 5))
        index.enable_entry_sampler(n_samples=128, seed=0)
        res = index.search(queries[:32], 5)
        assert index._entry_sampler is not None
        assert svt.k_recall_at_n(gt, res) >= base - 0.05
        # sampled ids are all live slots
        sampled = np.asarray(index._entry_sampler.ids)
        assert (index.status[sampled] == 1).all()

        index.add_points(data[600:700], np.arange(600, 700))
        assert index._entry_sampler is None          # invalidated
        index.search(queries[:8], 5)
        assert index._entry_sampler is not None      # lazily rebuilt

        dead = np.arange(0, 80)
        index.delete_points(dead)
        res2 = index.search(queries[:32], 5)
        assert not np.isin(res2.ids, dead).any()
        index.consolidate()
        assert index._entry_sampler is None
        index.compact()
        res3 = index.search(queries[:32], 5)
        assert (res3.ids >= 0).all()
        assert not np.isin(res3.ids, dead).any()
        # post-compact sample drawn from remapped VALID slots only
        sampled = np.asarray(index._entry_sampler.ids)
        assert (index.status[sampled] == 1).all()
        index.disable_entry_sampler()
        assert index._entry_sampler is None

    def test_sampler_cfg_persists(self, tmp_path, pool):
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        index = MutableVamanaIndex(params, data[:300], np.arange(300), "l2")
        index.enable_entry_sampler(n_samples=64, seed=5)
        index.save(str(tmp_path / "d"))
        loaded = MutableVamanaIndex.assemble(str(tmp_path / "d"))
        assert loaded._sampler_cfg == (64, 1, 5)
        res = loaded.search(queries[:8], 5)
        assert res.ids.shape == (8, 5) and (res.ids >= 0).all()

    def test_entry_point_survives_deletion(self, pool):
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        index = MutableVamanaIndex(params, data[:300], np.arange(300), "l2")
        entry_ext = index.translator.to_external([index.entry_point])[0]
        index.delete_points([entry_ext])
        assert index.status[index.entry_point] == 1  # new valid entry
        res = index.search(queries[:4], 5)
        assert (res.ids >= 0).all()
        assert entry_ext not in res.ids


class TestDynamicOrchestrators:
    def test_dynamic_vamana_surface(self, pool):
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        dv = DynamicVamana.build(params, data[:400], np.arange(400), "l2")
        assert dv.size == 400 and dv.has_id(3)
        dv.add_points(data[400:450], np.arange(400, 450))
        dv.delete_points(np.arange(10))
        dv.consolidate().compact()
        assert dv.size == 440
        assert not dv.has_id(3)
        res = dv.search(queries[:8], 5)
        assert res.ids.shape == (8, 5)
        assert dv.alpha == pytest.approx(1.2)
        # TPU serving levers delegate through the orchestrator
        dv.enable_packed_serving()
        dv.enable_entry_sampler(n_samples=64, seed=0)
        res2 = dv.search(queries[:8], 5)
        assert res2.ids.shape == (8, 5) and (res2.ids >= 0).all()
        dv.disable_entry_sampler()
        dv.disable_packed_serving()

    def test_dynamic_flat_surface(self, pool):
        data, queries = pool
        df = DynamicFlat.build(data[:100], np.arange(100), "l2")
        df.add_points(data[100:120], np.arange(100, 120))
        df.delete_points([0, 1])
        assert df.size == 118
        res = df.search(queries[:4], 3)
        assert 0 not in res.ids and 1 not in res.ids


class TestDynamicPersistence:
    def test_save_assemble_roundtrip(self, tmp_path, pool):
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        dv = DynamicVamana.build(params, data[:400], np.arange(400), "l2")
        dv.add_points(data[400:450], np.arange(400, 450))
        dv.delete_points(np.arange(5))
        dv.save(str(tmp_path / "dyn"))
        dv2 = DynamicVamana.assemble(str(tmp_path / "dyn"))
        assert dv2.size == dv.size
        np.testing.assert_array_equal(dv2.all_ids(), dv.all_ids())
        a = dv.search(queries[:8], 5)
        b = dv2.search(queries[:8], 5)
        np.testing.assert_array_equal(a.ids, b.ids)
        # mutations continue to work after reload
        dv2.add_points(data[450:460], np.arange(450, 460))
        assert dv2.size == dv.size + 10

    def test_get_distance_external(self, pool):
        data, queries = pool
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32)
        dv = DynamicVamana.build(params, data[:100], np.arange(100) + 500,
                                 "l2")
        d = dv.get_distance(503, queries[0])
        want = ((queries[0] - data[3]) ** 2).sum()
        assert abs(d - want) / want < 1e-4
