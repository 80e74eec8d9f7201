"""Flat index integration tests: exhaustive search vs NumPy exact search, the
TPU analog of the reference's tests/integration/exhaustive.cpp."""

import numpy as np
import pytest
import jax.numpy as jnp

from scalablevectorsearch_tpu.core.recall import k_recall_at_n
from scalablevectorsearch_tpu.index.flat import FlatIndex, exhaustive_search
from scalablevectorsearch_tpu.ops.distance import DistanceType

D = DistanceType


def np_exact(distance, x, q, k):
    xq = x.astype(np.float64)
    qq = q.astype(np.float64)
    dots = qq @ xq.T
    if distance == D.L2:
        keys = ((qq ** 2).sum(1)[:, None] - 2 * dots + (xq ** 2).sum(1)[None])
    elif distance == D.MIP:
        keys = -dots
    else:
        keys = -dots / (np.linalg.norm(qq, axis=1)[:, None]
                        * np.linalg.norm(xq, axis=1)[None])
    return np.argsort(keys, axis=1, kind="stable")[:, :k]


class TestFlatIndex:
    @pytest.mark.parametrize("distance", [D.L2, D.MIP, D.Cosine])
    def test_exact_recall(self, small_dataset, distance):
        data, queries = small_dataset
        index = FlatIndex.from_array(data, distance=distance,
                                     data_batch_size=512)
        result = index.search(queries, 10)
        gt = np_exact(distance, data, queries, 10)
        assert k_recall_at_n(gt, result) >= 0.999

    def test_distances_are_public_convention(self, small_dataset):
        data, queries = small_dataset
        res_l2 = FlatIndex.from_array(data, distance=D.L2).search(queries, 1)
        # squared L2, non-negative
        assert (res_l2.distances >= 0).all()
        d0 = ((queries[0] - data[res_l2.ids[0, 0]]) ** 2).sum()
        np.testing.assert_allclose(res_l2.distances[0, 0], d0, rtol=1e-3)

        res_ip = FlatIndex.from_array(data, distance=D.MIP).search(queries, 1)
        ip0 = queries[0] @ data[res_ip.ids[0, 0]]
        np.testing.assert_allclose(res_ip.distances[0, 0], ip0, rtol=1e-3)

        res_cos = FlatIndex.from_array(data, distance=D.Cosine).search(queries, 1)
        assert (res_cos.distances <= 1.0 + 1e-5).all()

    def test_search_async_parity(self, small_dataset):
        data, queries = small_dataset
        index = FlatIndex.from_array(data, distance=D.L2)
        sync = index.search(queries, 10)
        handles = [index.search_async(queries, 10) for _ in range(2)]
        for h in handles:
            res = h.result()
            np.testing.assert_array_equal(res.ids, sync.ids)
            np.testing.assert_array_equal(res.distances, sync.distances)

    def test_row_mask_filters(self, small_dataset):
        data, queries = small_dataset
        index = FlatIndex.from_array(data, distance=D.L2)
        full = index.search(queries[:5], 1)
        mask = np.ones(index.data.capacity, dtype=bool)
        mask[full.ids[:, 0]] = False  # ban each query's best hit
        filtered = index.search(queries[:5], 1, row_mask=mask)
        assert not np.any(filtered.ids[:, 0] == full.ids[:, 0])

    def test_k_exceeds_n(self):
        x = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
        res = exhaustive_search(x, x[:2], 10)
        assert (res.ids[:, 5:] == -1).all()
        assert (res.ids[:, 0] == [0, 1]).all()

    def test_save_assemble(self, tmp_path, small_dataset):
        data, queries = small_dataset
        index = FlatIndex.from_array(data, distance=D.MIP)
        index.save(str(tmp_path / "flat"))
        loaded = FlatIndex.assemble(str(tmp_path / "flat"))
        assert loaded.distance == D.MIP
        a = index.search(queries[:10], 5)
        b = loaded.search(queries[:10], 5)
        np.testing.assert_array_equal(a.ids, b.ids)

    def test_bundled_dataset_groundtruth(self, bundled_dataset):
        """The flat index must agree with exact NumPy float64 search on the
        bundled-style 10k x 128 dataset (ground-truth engine validation)."""
        data, queries = bundled_dataset
        queries = queries[:64]
        for distance in [D.L2, D.MIP]:
            gt = np_exact(distance, data, queries, 10)
            res = FlatIndex.from_array(data, distance=distance).search(
                queries, 10)
            # f32 accumulation vs f64 ground truth can flip boundary ties
            assert k_recall_at_n(gt, res, n=10, k=10) >= 0.995, distance
