"""IVF tests: k-means training quality, clustering container, index recall
sweeps vs exact ground truth, rerank, persistence (mirrors
tests/svs/index/ivf/ + tests/integration/ivf/)."""

import numpy as np
import pytest

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
from scalablevectorsearch_tpu.index.ivf.index import IVFIndex
from scalablevectorsearch_tpu.index.ivf.kmeans import (
    assign_full, hierarchical_kmeans, kmeans_training, train_clustering)
from scalablevectorsearch_tpu.index.ivf.params import (IVFBuildParameters,
                                                       IVFSearchParameters)
from scalablevectorsearch_tpu.lib import saveload
from scalablevectorsearch_tpu.orchestrators.ivf import IVF
from scalablevectorsearch_tpu.quantization.lvq import LVQDataset


@pytest.fixture(scope="module")
def clustered():
    from scalablevectorsearch_tpu.core.io import generate_test_dataset
    return generate_test_dataset(4000, 200, 32, seed=21)


class TestKMeans:
    def test_minibatch_recovers_clusters(self, rng):
        centers = rng.normal(scale=50, size=(8, 16)).astype(np.float32)
        x = np.concatenate([c + rng.normal(size=(100, 16)).astype(np.float32)
                            for c in centers])
        cents = kmeans_training(x, 8, minibatch_size=200, num_iterations=8,
                                seed=0)
        assign = assign_full(x, cents)
        # each true cluster maps to exactly one learned centroid
        for i in range(8):
            assert len(np.unique(assign[i * 100:(i + 1) * 100])) == 1
        assert len(np.unique(assign)) == 8

    def test_hierarchical_counts(self, clustered):
        data, _ = clustered
        cents = hierarchical_kmeans(data, 50, minibatch_size=1000,
                                    num_iterations=4, seed=1)
        assert cents.shape == (50, data.shape[1])
        assign = assign_full(data, cents)
        sizes = np.bincount(assign, minlength=50)
        assert (sizes > 0).sum() >= 40  # few empty clusters

    def test_no_empty_clusters_after_split(self, rng):
        x = rng.normal(size=(500, 8)).astype(np.float32)
        cents = kmeans_training(x, 32, minibatch_size=100, num_iterations=6,
                                seed=3)
        sizes = np.bincount(assign_full(x, cents), minlength=32)
        assert (sizes == 0).sum() <= 2


class TestClustering:
    def test_build_and_save(self, tmp_path, clustered):
        data, _ = clustered
        params = IVFBuildParameters(num_centroids=64, num_iterations=4,
                                    training_fraction=0.5)
        c = Clustering.build(params, data)
        assert c.num_centroids == 64
        assert c.assignments.shape == (4000,)
        saveload.save_to_disk(c, str(tmp_path / "clust"))
        c2 = saveload.load_from_disk(Clustering, str(tmp_path / "clust"))
        np.testing.assert_array_equal(c.assignments, c2.assignments)


class TestIVFIndex:
    @pytest.fixture(scope="class")
    def built(self, clustered):
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=64, num_iterations=6,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        index = IVFIndex.build(params, data, "l2")
        gt = svt.exhaustive_search(data, queries, 10)
        return index, data, queries, gt

    def test_recall_improves_with_probes(self, built):
        index, data, queries, gt = built
        prev = 0.0
        for probes, floor in [(2, 0.35), (8, 0.75), (32, 0.97)]:
            res = index.search(queries, 10,
                               IVFSearchParameters(n_probes=probes))
            rec = svt.k_recall_at_n(gt, res)
            assert rec >= floor, f"probes={probes} recall={rec}"
            assert rec >= prev - 0.02
            prev = rec

    def test_full_probe_is_exhaustive(self, built, monkeypatch):
        # exactness check: pin full-width query uploads (the f16 serving
        # default perturbs near-tie distances by ~1e-3 — fine for ANN
        # serving, not for an exhaustive-equivalence assertion)
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "float32")
        index, data, queries, gt = built
        res = index.search(queries, 10,
                           IVFSearchParameters(n_probes=64))
        assert svt.k_recall_at_n(gt, res) >= 0.999

    def test_search_async_parity(self, built):
        """search_async pipelines whole calls (Vamana's PendingSearch
        pattern): results are identical to the blocking search."""
        index, data, queries, gt = built
        sp = IVFSearchParameters(n_probes=8)
        sync = index.search(queries, 10, sp)
        handles = [index.search_async(queries, 10, sp) for _ in range(2)]
        for h in handles:
            res = h.result()
            np.testing.assert_array_equal(res.ids, sync.ids)
            np.testing.assert_array_equal(res.distances, sync.distances)

    def test_scan_layout_parity(self, built, monkeypatch):
        """The super-row scan layout (one contiguous sub*d gather per
        tile instead of sub row gathers — the fewer/larger-rows trade
        that took 10M IVF serving 648 -> 6303 QPS) must return the same
        neighbors as the protocol-gather path.  Ids must match exactly;
        distances only to f32 tolerance (the super-row path recomputes
        norms from gathered rows instead of gathering the f64-accurate
        cached norms)."""
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "float32")
        index, data, queries, gt = built
        sp = IVFSearchParameters(n_probes=8)
        monkeypatch.setenv("SVT_IVF_SCAN_LAYOUT", "0")
        index._scan_vecs = index._scan_ids = None
        index._scan_sub = 0
        plain = index.search(queries, 10, sp)
        monkeypatch.setenv("SVT_IVF_SCAN_LAYOUT", "1")
        fast = index.search(queries, 10, sp)
        assert index._scan_vecs is not None  # fast path actually engaged
        np.testing.assert_array_equal(plain.ids, fast.ids)
        np.testing.assert_allclose(plain.distances, fast.distances,
                                   rtol=1e-4, atol=1e-4)

    def test_tiles_per_step_parity(self, built, monkeypatch):
        """Chunked probe scan (tiles_per_step > 1: fewer/bigger merges at
        the same total gather count) must return identical results to the
        per-sub-tile scan on both the protocol and super-row paths."""
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "float32")
        index, data, queries, gt = built
        sp = IVFSearchParameters(n_probes=8)
        for layout in ("0", "1"):
            monkeypatch.setenv("SVT_IVF_SCAN_LAYOUT", layout)
            index._scan_vecs = index._scan_ids = None
            index._scan_sub = 0
            results = []
            for tiles in (1, 2, 0):   # 0 = auto (whole probe per step)
                index.scan_tiles_per_step = tiles
                results.append(index.search(queries, 10, sp))
            index.scan_tiles_per_step = 0
            for other in results[1:]:
                np.testing.assert_array_equal(results[0].ids, other.ids)
                np.testing.assert_allclose(results[0].distances,
                                           other.distances,
                                           rtol=1e-4, atol=1e-4)

    def test_skewed_clusters_chunked_postings(self, rng):
        """Cluster-size skew must not blow up the dense layout (measured
        48 GB at 10M x 96 / K=8192 uncapped): oversized clusters chunk
        into probe units that replicate their centroid, bounding the
        layout at ~max_posting_factor x the balanced size, with recall
        preserved at modestly higher probe counts."""
        # one hot region with 70% of the mass + small scattered clusters
        hot = rng.normal(scale=0.5, size=(2800, 24)).astype(np.float32)
        rest = (rng.normal(scale=30.0, size=(40, 24))[
            rng.integers(0, 40, size=1200)]
            + rng.normal(size=(1200, 24))).astype(np.float32)
        data = np.concatenate([hot, rest])
        queries = data[rng.choice(4000, size=100, replace=False)]
        gt = svt.exhaustive_search(data, queries, 10)
        params = IVFBuildParameters(num_centroids=64, num_iterations=6,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        capped = IVFIndex.build(params, data, "l2",
                                max_posting_factor=2.0)
        uncapped = IVFIndex.build(params, data, "l2",
                                  max_posting_factor=0)
        # per-unit slot bounded at ~factor * mean (skew-proof), so the
        # layout is never larger than the max-driven uncapped one and the
        # waste is bounded by ~factor x regardless of skew
        assert capped.slot <= 2 * -(-4000 // 64) + 8
        assert capped.slot < uncapped.slot
        assert capped.ids_padded.shape[0] <= uncapped.ids_padded.shape[0]
        assert capped.num_centroids == 64    # logical clusters unchanged
        assert capped.num_probe_units > 64   # chunks replicate centroids
        rec_c = svt.k_recall_at_n(gt, capped.search(
            queries, 10, IVFSearchParameters(n_probes=24)))
        rec_u = svt.k_recall_at_n(gt, uncapped.search(
            queries, 10, IVFSearchParameters(n_probes=16)))
        assert rec_c >= rec_u - 0.03, (rec_c, rec_u)
        assert rec_c >= 0.9, rec_c

    def test_save_load_roundtrip(self, tmp_path, built):
        index, data, queries, gt = built
        index.save(str(tmp_path / "ivf"))
        loaded = IVFIndex.assemble_from_file(str(tmp_path / "ivf"))
        a = index.search(queries[:20], 5)
        b = loaded.search(queries[:20], 5)
        np.testing.assert_array_equal(a.ids, b.ids)

    def test_host_side_save_matches_device_save(self, tmp_path, built):
        """save_packed_layout_host writes the same checkpoint WITHOUT a
        device->host readback (multi-GB blocking reads crawl at ~2 MB/s
        through the tunnel — round-4 ADVICE); an f32-eltype host save must
        serve identically to the device save path."""
        from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
        from scalablevectorsearch_tpu.index.ivf.index import (
            save_packed_layout_host)
        index, data, queries, gt = built
        params = IVFBuildParameters(num_centroids=64, num_iterations=6,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        clustering = Clustering.build(params, data)
        via_device = IVFIndex.assemble_from_clustering(clustering, data,
                                                       "l2")
        via_device.save(str(tmp_path / "dev"))
        save_packed_layout_host(str(tmp_path / "host"), clustering, data,
                                "l2", eltype="float32")
        a = IVFIndex.assemble_from_file(str(tmp_path / "dev"))
        b = IVFIndex.assemble_from_file(str(tmp_path / "host"))
        assert a.slot == b.slot and a.n == b.n
        np.testing.assert_array_equal(np.asarray(a.ids_padded),
                                      np.asarray(b.ids_padded))
        sp = IVFSearchParameters(n_probes=8)
        ra = a.search(queries[:64], 10, sp)
        rb = b.search(queries[:64], 10, sp)
        np.testing.assert_array_equal(ra.ids, rb.ids)
        # bfloat16 eltype (the 10M cache format) must also roundtrip
        save_packed_layout_host(str(tmp_path / "bf16"), clustering, data,
                                "l2", eltype="bfloat16")
        c = IVFIndex.assemble_from_file(str(tmp_path / "bf16"))
        import jax.numpy as jnp
        assert c.data.dtype == jnp.bfloat16
        rc = c.search(queries[:64], 10, sp)
        assert svt.k_recall_at_n(
            np.asarray(ra.ids), rc) >= 0.95

    def test_mip_distance(self, clustered):
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=32, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        index = IVFIndex.build(params, data, "mip")
        gt = svt.exhaustive_search(data, queries, 10, distance="mip")
        res = index.search(queries, 10, IVFSearchParameters(n_probes=16))
        assert svt.k_recall_at_n(gt, res) >= 0.8

    def test_compressed_postings_with_rerank(self, clustered):
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=32, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        clustering = Clustering.build(params, data)
        index = IVFIndex.assemble_from_clustering(
            clustering, data, "l2", dataset_cls=LVQDataset, rerank=True)
        gt = svt.exhaustive_search(data, queries, 10)
        res = index.search(queries, 10, IVFSearchParameters(
            n_probes=16, k_reorder=3))
        assert svt.k_recall_at_n(gt, res) >= 0.9


class TestIVFOrchestrator:
    def test_surface(self, tmp_path, clustered):
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=32, num_iterations=3,
                                    training_fraction=0.5)
        ivf = IVF.build(params, data, "l2")
        assert ivf.size == 4000 and ivf.num_centroids == 32
        ivf.n_probes = 8
        res = ivf.search(queries[:10], 5)
        assert res.ids.shape == (10, 5)
        ivf.save(str(tmp_path / "ivf"))
        ivf2 = IVF.assemble_from_file(str(tmp_path / "ivf"))
        res2 = ivf2.search(queries[:10], 5)
        ivf2.n_probes = 8
        res2 = ivf2.search(queries[:10], 5)
        np.testing.assert_array_equal(res.ids, res2.ids)


class TestDynamicIVF:
    def test_search_async_parity(self, clustered):
        from scalablevectorsearch_tpu.index.ivf.dynamic import DynamicIVF
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=32, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        ext = np.arange(2000, dtype=np.int64) * 3 + 1
        div = DynamicIVF.build(params, data[:2000], ext, "l2")
        sync = div.search(queries, 10)
        handles = [div.search_async(queries, 10) for _ in range(2)]
        for h in handles:
            res = h.result()
            np.testing.assert_array_equal(res.ids, sync.ids)
            np.testing.assert_array_equal(res.distances, sync.distances)

    def test_mutation_lifecycle(self, clustered):
        from scalablevectorsearch_tpu.index.ivf.dynamic import DynamicIVF
        from scalablevectorsearch_tpu.utils.dynamic_helper import (
            ReferenceDataset)
        data, queries = clustered
        ref = ReferenceDataset(data, seed=5)
        pts, ids = ref.new_batch(2000)
        params = IVFBuildParameters(num_centroids=32, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        div = DynamicIVF.build(params, pts, ids, "l2")
        assert div.size == 2000

        def check(floor):
            res = div.search(queries, 10)
            ref.check_ids(res)
            gt = ref.groundtruth(queries, 10)
            from scalablevectorsearch_tpu.core.recall import k_recall_at_n
            rec = k_recall_at_n(gt, res)
            assert rec >= floor, rec

        div._index.search(queries, 10,
                          IVFSearchParameters(n_probes=32))  # full probe
        for _ in range(2):
            pts, ids = ref.new_batch(300)
            div.add_points(pts, ids)
            dead = ref.delete_batch(200)
            div.delete_points(dead)
            # full-probe search over a mutated index must stay exact-ish
            res = div._index.search(queries, 10,
                                    IVFSearchParameters(n_probes=32))
            ref.check_ids(res)
            gt = ref.groundtruth(queries, 10)
            from scalablevectorsearch_tpu.core.recall import k_recall_at_n
            assert k_recall_at_n(gt, res) >= 0.99
        assert div.size == len(ref.live)
        div.compact()
        res = div._index.search(queries, 10,
                                IVFSearchParameters(n_probes=32))
        ref.check_ids(res)

    def test_per_cluster_growth_on_overflow(self, rng):
        """Overflowing ONE cluster grows only that cluster (extra probe
        units), never repacks the layout (reference per-cluster blocked
        resize, dynamic_ivf.h:889-996)."""
        from scalablevectorsearch_tpu.index.ivf.dynamic import DynamicIVF
        from scalablevectorsearch_tpu.index.ivf.params import (
            IVFSearchParameters)
        x = rng.normal(size=(200, 16)).astype(np.float32)
        params = IVFBuildParameters(num_centroids=4, num_iterations=3,
                                    training_fraction=1.0,
                                    is_hierarchical=False)
        div = DynamicIVF.build(params, x, np.arange(200), "l2")
        idx = div._index
        slot_before, units_before = idx.slot, idx.num_probe_units
        assert units_before == 4
        # add many near-identical points -> all land in one cluster
        burst = (x[0] + rng.normal(scale=0.01, size=(3 * slot_before, 16))
                 ).astype(np.float32)
        div.add_points(burst, np.arange(1000, 1000 + burst.shape[0]))
        assert idx.slot == slot_before           # layout NOT repacked
        assert idx.num_probe_units > units_before
        assert idx.num_centroids == 4            # logical count unchanged
        # only the hot cluster gained units
        grown = np.bincount(idx.unit_owner, minlength=4)
        assert (grown > 1).sum() == 1, grown
        assert div.size == 200 + burst.shape[0]
        # full-probe search over the grown layout is exact
        full = IVFSearchParameters(n_probes=idx.num_probe_units)
        gt = svt.exhaustive_search(
            np.concatenate([x, burst]), x[:20], 5)
        res = idx.search(x[:20], 5, full)
        internal = np.concatenate([np.arange(200),
                                   np.arange(1000, 1000 + burst.shape[0])])
        mapped = np.where(res.ids >= 0,
                          np.searchsorted(internal, res.ids), -1)
        hits = sum(len(set(a) & set(b))
                   for a, b in zip(mapped, np.asarray(gt.ids)))
        assert hits / gt.ids.size >= 0.99
        # compact collapses back to one unit per cluster
        div.compact()
        assert idx.num_probe_units == 4
        res2 = idx.search(x[:20], 5, IVFSearchParameters(n_probes=4))
        assert (np.sort(res2.ids, axis=1) == np.sort(res.ids, axis=1)).all()

    def test_bulk_add_is_vectorized(self, rng):
        """Bulk adds must not do per-point host work: 20k points into a 50k
        index in one call (the round-3 per-point loop took O(n_add * slot)
        host ops; this size finishes in seconds only when vectorized)."""
        import time

        from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
        from scalablevectorsearch_tpu.index.ivf.dynamic import (
            DynamicIVFIndex)
        x = rng.normal(size=(50_000, 16)).astype(np.float32)
        params = IVFBuildParameters(num_centroids=64, num_iterations=3,
                                    training_fraction=0.2,
                                    is_hierarchical=False)
        clustering = Clustering.build(params, x)
        idx = DynamicIVFIndex(clustering, x, np.arange(50_000), "l2")
        extra = rng.normal(size=(20_000, 16)).astype(np.float32)
        t0 = time.monotonic()
        idx.add_points(extra, np.arange(100_000, 120_000))
        add_s = time.monotonic() - t0
        assert idx.size == 70_000
        assert add_s < 30.0, f"bulk add took {add_s:.1f}s"
        # spot-check integrity: every added id is findable at full probe
        from scalablevectorsearch_tpu.index.ivf.params import (
            IVFSearchParameters)
        res = idx.search(extra[:32], 1, IVFSearchParameters(
            n_probes=idx.num_probe_units))
        np.testing.assert_array_equal(
            res.ids[:, 0], np.arange(100_000, 100_032))


class TestIVFIterator:
    def test_paged_disjoint(self, clustered):
        from scalablevectorsearch_tpu.index.ivf.iterator import (
            IVFBatchIterator)
        data, queries = clustered
        params = IVFBuildParameters(num_centroids=32, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        index = IVFIndex.build(params, data, "l2")
        it = IVFBatchIterator(index, queries[0], batch_size=8)
        seen = set()
        for _ in range(3):
            res = it.next()
            ids = res.ids[0][res.ids[0] >= 0]
            assert not (set(ids.tolist()) & seen)
            seen.update(ids.tolist())
        assert len(seen) == 24
        gt = svt.exhaustive_search(data, queries[:1], 8)
        it.restart()
        first = it.next()
        overlap = len(set(first.ids[0].tolist())
                      & set(gt.ids[0].tolist()))
        assert overlap >= 5


class TestBF16SublanePadding:
    def test_bf16_layout_with_nonmultiple16_total(self, tmp_path):
        """bf16 datasets pad capacity to 16-row tiles, so the (total,)
        padding mask must be widened to the dataset capacity — a 24-row
        layout crashed broadcasting against 32 norms (round-5 review)."""
        import jax.numpy as jnp
        from scalablevectorsearch_tpu.core.data import VectorDataset
        from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
        from scalablevectorsearch_tpu.index.ivf.index import (
            IVFIndex, save_packed_layout_host)
        rng = np.random.default_rng(4)
        # 3 clusters of 5 -> slot 8, total 24; bf16 capacity pads to 32
        centers = np.asarray([[0, 0], [40, 40], [-40, 40]], np.float32)
        x = np.repeat(centers, 5, axis=0) + \
            rng.normal(size=(15, 2)).astype(np.float32)
        clustering = Clustering.build(
            IVFBuildParameters(num_centroids=3, num_iterations=8,
                               training_fraction=1.0,
                               is_hierarchical=False), x)
        save_packed_layout_host(str(tmp_path / "bf16"), clustering, x,
                                "l2", eltype="bfloat16")
        idx = IVFIndex.assemble_from_file(str(tmp_path / "bf16"))
        assert idx.data.dtype == jnp.bfloat16
        res = idx.search(x[:6], 1, IVFSearchParameters(n_probes=3))
        np.testing.assert_array_equal(np.asarray(res.ids)[:, 0],
                                      np.arange(6))

        class _BF16Rows:
            from_array = staticmethod(
                lambda rows: VectorDataset.from_array(
                    rows, dtype=jnp.bfloat16))

        idx2 = IVFIndex.assemble_from_clustering(clustering, x, "l2",
                                                 dataset_cls=_BF16Rows)
        res2 = idx2.search(x[:6], 1, IVFSearchParameters(n_probes=3))
        np.testing.assert_array_equal(np.asarray(res2.ids)[:, 0],
                                      np.arange(6))
