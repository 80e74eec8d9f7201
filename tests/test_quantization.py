"""Quantization tests: SQ + LVQ datasets — reconstruction error bounds,
code-domain distance accuracy, index integration, persistence (mirrors
tests/svs/quantization/scalar/ + integration/vamana/scalar_*.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.index.flat import FlatIndex
from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
from scalablevectorsearch_tpu.index.vamana.params import VamanaBuildParameters
from scalablevectorsearch_tpu.lib import saveload
from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
from scalablevectorsearch_tpu.quantization.scalar import SQDataset
from scalablevectorsearch_tpu.core.loading import dispatch_load


class TestSQDataset:
    def test_reconstruction_error(self, rng):
        x = rng.normal(size=(100, 32)).astype(np.float32) * 5
        sq = SQDataset.compress(x)
        err = np.abs(sq.to_numpy() - x).max()
        assert err <= sq.max_abs_error() + 1e-5

    def test_get_decodes(self, rng):
        x = rng.normal(size=(50, 16)).astype(np.float32)
        sq = SQDataset.compress(x)
        got = np.asarray(sq.get(jnp.array([3, 7])))[:, :16]
        np.testing.assert_allclose(got, sq.to_numpy()[[3, 7]], atol=1e-5)
        # dead columns decode to zero
        full = np.asarray(sq.get(jnp.array([3])))
        assert np.all(full[:, 16:] == 0)

    @pytest.mark.parametrize("distance", ["l2", "mip"])
    def test_flat_search_recall(self, rng, distance):
        x = (rng.normal(size=(1000, 48)) * 3).astype(np.float32)
        q = (rng.normal(size=(50, 48)) * 3).astype(np.float32)
        sq = SQDataset.compress(x)
        index = FlatIndex(sq, distance, data_batch_size=256)
        res = index.search(q, 10)
        gt = svt.exhaustive_search(x, q, 10, distance=distance)
        assert svt.k_recall_at_n(gt, res) >= 0.9

    def test_save_load(self, tmp_path, rng):
        x = rng.normal(size=(40, 24)).astype(np.float32)
        sq = SQDataset.compress(x)
        saveload.save_to_disk(sq, str(tmp_path / "sq"))
        sq2 = dispatch_load(str(tmp_path / "sq"))
        assert isinstance(sq2, SQDataset)
        np.testing.assert_allclose(sq2.to_numpy(), sq.to_numpy(), atol=1e-6)
        assert float(sq2.scale) == pytest.approx(float(sq.scale))


class TestLVQDataset:
    def test_reconstruction_better_than_sq(self, rng):
        # heterogeneous row scales: per-vector quantization must win
        x = (rng.normal(size=(200, 32))
             * rng.uniform(0.1, 10, size=(200, 1))).astype(np.float32)
        lvq_err = np.abs(LVQDataset.compress(x).to_numpy() - x).mean()
        sq_err = np.abs(SQDataset.compress(x).to_numpy() - x).mean()
        assert lvq_err < sq_err / 2

    def test_get_matches_to_numpy(self, rng):
        x = rng.normal(size=(60, 20)).astype(np.float32)
        lvq = LVQDataset.compress(x)
        got = np.asarray(lvq.get(jnp.array([0, 59])))[:, :20]
        np.testing.assert_allclose(got, lvq.to_numpy()[[0, 59]], atol=1e-4)

    @pytest.mark.parametrize("distance", ["l2", "mip", "cosine"])
    def test_flat_search_recall(self, rng, distance):
        x = (rng.normal(size=(1000, 48)) * 3).astype(np.float32)
        q = (rng.normal(size=(50, 48)) * 3).astype(np.float32)
        lvq = LVQDataset.compress(x)
        index = FlatIndex(lvq, distance, data_batch_size=256)
        res = index.search(q, 10)
        gt = svt.exhaustive_search(x, q, 10, distance=distance)
        assert svt.k_recall_at_n(gt, res) >= 0.95

    def test_vamana_over_lvq(self, small_dataset):
        data, queries = small_dataset
        lvq = LVQDataset.compress(data)
        params = VamanaBuildParameters(graph_max_degree=24, window_size=48)
        idx = VamanaIndex.build(params, lvq, "l2", batch_size=256)
        idx.search_window_size = 30
        gt = svt.exhaustive_search(data, queries, 10)
        rec = svt.k_recall_at_n(gt, idx.search(queries, 10))
        assert rec >= 0.85

    def test_save_load(self, tmp_path, rng):
        x = rng.normal(size=(40, 24)).astype(np.float32)
        lvq = LVQDataset.compress(x)
        saveload.save_to_disk(lvq, str(tmp_path / "lvq"))
        lvq2 = dispatch_load(str(tmp_path / "lvq"))
        assert isinstance(lvq2, LVQDataset)
        np.testing.assert_allclose(lvq2.to_numpy(), lvq.to_numpy(), atol=1e-6)
