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

    @pytest.mark.parametrize("dtype", [jnp.int8, jnp.uint8, jnp.int16])
    def test_code_dtype_matrix(self, tmp_path, rng, dtype):
        """SQ is generic over code element types like the reference
        (scalar.h:363): reconstruction bound, code-domain search, and
        save/load for each supported dtype."""
        x = (rng.normal(size=(400, 32)) * 3).astype(np.float32)
        q = (rng.normal(size=(20, 32)) * 3).astype(np.float32)
        sq = SQDataset.compress(x, dtype=dtype)
        assert sq.codes.dtype == jnp.dtype(dtype)
        err = np.abs(sq.to_numpy() - x).max()
        assert err <= sq.max_abs_error() + 1e-5
        # int16 has 256x finer resolution than the 8-bit kinds
        if dtype == jnp.int16:
            assert err < 1e-3
        index = FlatIndex(sq, "l2", data_batch_size=128)
        res = index.search(q, 10)
        gt = svt.exhaustive_search(x, q, 10)
        assert svt.k_recall_at_n(gt, res) >= 0.9
        saveload.save_to_disk(sq, str(tmp_path / "sq"))
        sq2 = dispatch_load(str(tmp_path / "sq"))
        assert sq2.codes.dtype == jnp.dtype(dtype)
        np.testing.assert_allclose(sq2.to_numpy(), sq.to_numpy(), atol=1e-6)

    def test_rejects_unsupported_dtype(self, rng):
        x = rng.normal(size=(10, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            SQDataset.compress(x, dtype=jnp.int32)

    def test_vamana_over_sq(self, small_dataset):
        """Vamana build + search over SQ codes (the dataset-protocol path
        the examples use; regression: SQDataset once lacked norms_of and
        only the flat path was exercised)."""
        data, queries = small_dataset
        sq = SQDataset.compress(data)
        params = VamanaBuildParameters(graph_max_degree=24,
                                       window_size=48, alpha=1.1)
        idx = VamanaIndex.build(params, sq, "l2", batch_size=256)
        idx.search_window_size = 30
        gt = svt.exhaustive_search(data, queries, 10)
        rec = svt.k_recall_at_n(gt, idx.search(queries, 10))
        # global 8-bit quantization caps recall ~0.845 on this dataset
        # (widening the window does not help: reconstruction-error bound)
        assert rec >= 0.8


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
        # alpha=1.1: honest-pool optimum on clustered data (PERF.md round 2)
        params = VamanaBuildParameters(graph_max_degree=24,
                                       window_size=48, alpha=1.1)
        idx = VamanaIndex.build(params, lvq, "l2", batch_size=256)
        idx.search_window_size = 30
        gt = svt.exhaustive_search(data, queries, 10)
        rec = svt.k_recall_at_n(gt, idx.search(queries, 10))
        assert rec >= 0.85
        # sampler over compressed datasets: the sample decodes to f32
        # once (entry.build_sampler uses get_f32), selection at full
        # precision; recall must not regress
        idx.enable_entry_sampler(n_samples=256, seed=0)
        rec_s = svt.k_recall_at_n(gt, idx.search(queries, 10))
        assert rec_s >= rec - 0.05, (rec_s, rec)
        idx.disable_entry_sampler()

    @pytest.mark.parametrize("bits,res", [(8, 0), (4, 0), (8, 8)])
    def test_lvq_packed_serving_bit_identical(self, small_dataset, bits,
                                              res):
        """LVQ-packed neighborhoods decode the EXACT primary reconstruction
        (packed.pack_neighborhoods_lvq): results must be bit-identical to
        the unpacked LVQ traversal at every window, unlike lossy bf16
        packing (which re-scores)."""
        from scalablevectorsearch_tpu.index.vamana.packed import \
            PackedLVQNeighborhoods
        data, queries = small_dataset
        lvq = LVQDataset.compress(data, bits=bits, residual_bits=res)
        params = VamanaBuildParameters(graph_max_degree=16,
                                       window_size=32, alpha=1.1)
        idx = VamanaIndex.build(params, lvq, "l2", batch_size=256)
        idx.search_window_size = 20
        plain = idx.search(queries[:64], 10)
        idx.enable_packed_serving()
        assert isinstance(idx._packed, PackedLVQNeighborhoods)
        packed = idx.search(queries[:64], 10)
        np.testing.assert_array_equal(plain.ids, packed.ids)
        np.testing.assert_allclose(plain.distances, packed.distances,
                                   rtol=1e-6)
        idx.disable_packed_serving()

    def test_save_load(self, tmp_path, rng):
        x = rng.normal(size=(40, 24)).astype(np.float32)
        lvq = LVQDataset.compress(x)
        saveload.save_to_disk(lvq, str(tmp_path / "lvq"))
        lvq2 = dispatch_load(str(tmp_path / "lvq"))
        assert isinstance(lvq2, LVQDataset)
        np.testing.assert_allclose(lvq2.to_numpy(), lvq.to_numpy(), atol=1e-6)


class TestTwoLevelLVQ:
    """LVQ4 / LVQ4x4 / LVQ4x8 (reference StorageKind surface,
    api_defs.h:98-109; two-level scheme from [ABHT23])."""

    def test_kinds_and_packing(self, rng):
        x = rng.normal(size=(100, 40)).astype(np.float32)
        for bits, res, kind in [(4, 0, "LVQ4"), (4, 4, "LVQ4x4"),
                                (4, 8, "LVQ4x8"), (8, 8, "LVQ8x8"),
                                (8, 0, "LVQ8")]:
            ds = LVQDataset.compress(x, bits=bits, residual_bits=res)
            assert ds.kind == kind
            # 4-bit codes are packed two per byte
            assert ds.codes.shape[1] == ds.padded_dim // (8 // bits)

    def test_residual_accuracy_ladder(self, rng):
        x = (rng.normal(size=(300, 48))
             * rng.uniform(0.1, 10, size=(300, 1))).astype(np.float32)
        err4 = np.abs(LVQDataset.compress(x, bits=4).to_numpy() - x).mean()
        err4x4 = np.abs(LVQDataset.compress(
            x, bits=4, residual_bits=4).to_numpy() - x).mean()
        err4x8 = np.abs(LVQDataset.compress(
            x, bits=4, residual_bits=8).to_numpy() - x).mean()
        assert err4x4 < err4 / 4
        assert err4x8 < err4x4 / 4

    def test_primary_vs_full_decode(self, rng):
        x = rng.normal(size=(50, 24)).astype(np.float32)
        ds = LVQDataset.compress(x, bits=4, residual_bits=8)
        ids = jnp.arange(50)
        prim = np.asarray(ds.get(ids))[:, :24]
        full = np.asarray(ds.get_full(ids))[:, :24]
        assert np.abs(full - x).mean() < np.abs(prim - x).mean() / 4
        fv = ds.full_view()
        np.testing.assert_allclose(np.asarray(fv.get(ids))[:, :24], full,
                                   rtol=1e-5)

    @pytest.mark.parametrize("bits,res", [(4, 0), (4, 8)])
    def test_flat_search_recall(self, rng, bits, res):
        x = (rng.normal(size=(1000, 48)) * 3).astype(np.float32)
        q = (rng.normal(size=(50, 48)) * 3).astype(np.float32)
        lvq = LVQDataset.compress(x, bits=bits, residual_bits=res)
        index = FlatIndex(lvq, "l2", data_batch_size=256)
        res_out = index.search(q, 10)
        gt = svt.exhaustive_search(x, q, 10)
        # 4-bit primary alone is coarse; >= 0.8 without rerank
        assert svt.k_recall_at_n(gt, res_out) >= 0.8

    def test_vamana_over_lvq4_with_rerank(self, small_dataset):
        """Build through the full reconstruction (DecompressionAdaptor,
        scalar.h:548), traverse the 4-bit primary, auto-rerank the beam with
        the residual-corrected reconstruction — the reference's two-level
        search flow, all inside VamanaIndex.  VERDICT gate: recall@10 >= 0.9
        at ~4.25 bits/dim primary."""
        data, queries = small_dataset
        lvq = LVQDataset.compress(data, bits=4, residual_bits=8)
        # alpha=1.05: coarse 4-bit primary traversal wants a denser graph
        # than exact f32 (honest-pool sweep: 1.05 -> 0.91, 1.1 -> 0.81,
        # 1.2 -> 0.79 at w64 before the capacity split)
        params = VamanaBuildParameters(graph_max_degree=24,
                                       window_size=48, alpha=1.05)
        idx = VamanaIndex.build(params, lvq, "l2", batch_size=256)
        gt = svt.exhaustive_search(data, queries, 10)
        idx.search_window_size = 64
        rec = svt.k_recall_at_n(gt, idx.search(queries, 10))
        assert rec >= 0.9
        # reranking must not hurt vs the raw primary keys
        idx_raw = VamanaIndex(idx.graph, LVQDataset.compress(
            data, bits=4), idx.entry_point, "l2")
        idx_raw.search_window_size = 64
        rec_raw = svt.k_recall_at_n(gt, idx_raw.search(queries, 10))
        assert rec >= rec_raw - 0.01

    def test_save_load_two_level(self, tmp_path, rng):
        x = rng.normal(size=(40, 24)).astype(np.float32)
        lvq = LVQDataset.compress(x, bits=4, residual_bits=4)
        saveload.save_to_disk(lvq, str(tmp_path / "lvq4x4"))
        lvq2 = dispatch_load(str(tmp_path / "lvq4x4"))
        assert isinstance(lvq2, LVQDataset)
        assert lvq2.kind == "LVQ4x4"
        np.testing.assert_allclose(lvq2.to_numpy(), lvq.to_numpy(),
                                   atol=1e-6)


class TestLeanVec:
    def test_projection_preserves_neighbors(self, rng):
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecDataset)
        # anisotropic data: energy concentrated in a few directions
        basis = rng.normal(size=(48, 48)).astype(np.float32)
        scales = np.geomspace(10, 0.1, 48).astype(np.float32)
        x = (rng.normal(size=(2000, 48)).astype(np.float32) * scales) @ basis
        lv = LeanVecDataset.train(x, target_dim=16)
        assert lv.reduced_dim == 16 and lv.dim == 48
        # orthonormal projection
        ident = lv.projection.T @ lv.projection
        np.testing.assert_allclose(ident, np.eye(16), atol=1e-4)

    def test_leanvec_vamana_recall(self, rng):
        """On anisotropic data (LeanVec's target regime) reduced-dim search
        + rerank must stay close to full-dim recall."""
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecVamana)
        basis = np.linalg.qr(rng.normal(size=(48, 48)))[0].astype(np.float32)
        scales = np.geomspace(20, 0.05, 48).astype(np.float32)
        data = ((rng.normal(size=(2000, 48)) * scales) @ basis
                ).astype(np.float32)
        queries = ((rng.normal(size=(100, 48)) * scales) @ basis
                   ).astype(np.float32)
        # alpha=1.1: honest-pool optimum on clustered data (PERF.md round 2)
        params = VamanaBuildParameters(graph_max_degree=24,
                                       window_size=48, alpha=1.1)
        lvv = LeanVecVamana.build(params, data, "l2", target_dim=16,
                                  rerank_multiplier=3)
        lvv.search_window_size = 40
        gt = svt.exhaustive_search(data, queries, 10)
        rec = svt.k_recall_at_n(gt, lvv.search(queries, 10))
        assert rec >= 0.9, rec
        # sampler delegates to the reduced-dim primary (selection happens
        # on the projected queries, same space as the beam)
        lvv.enable_entry_sampler(n_samples=128, seed=0)
        rec_s = svt.k_recall_at_n(gt, lvv.search(queries, 10))
        assert rec_s >= rec - 0.05, (rec_s, rec)
        lvv.disable_entry_sampler()

    def test_query_aware_beats_pca_on_ood(self, rng):
        """The [TBAH24] headline case: out-of-distribution queries whose
        relevant subspace is NOT the data's top-variance subspace.  Data-only
        PCA keeps the high-variance (query-irrelevant) directions; the
        query-aware objective (generalized eigenproblem on the two
        second-moment matrices) must recover the query subspace
        (reference training.h:28-71 carries the query training set for
        exactly this)."""
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecDataset)
        n, m, k = 2000, 200, 10
        # dims 0..23: large variance, irrelevant to queries;
        # dims 24..31: small variance, ALL the query energy.
        data = np.concatenate(
            [rng.normal(size=(n, 24)) * 10.0, rng.normal(size=(n, 8))],
            axis=1).astype(np.float32)
        queries = np.concatenate(
            [np.zeros((m, 24)), rng.normal(size=(m, 8))],
            axis=1).astype(np.float32)
        gt = np.argsort(-(queries @ data.T), axis=1)[:, :k]

        def recall(lv):
            px = (data - lv.mean) @ lv.projection
            pq = lv.project_queries(queries)
            ids = np.argsort(-(pq @ px.T), axis=1)[:, :k]
            hits = sum(len(set(a) & set(b)) for a, b in zip(ids, gt))
            return hits / (m * k)

        lv_pca = LeanVecDataset.train(data, target_dim=8)
        lv_ood = LeanVecDataset.train(data, target_dim=8, queries=queries)
        r_pca, r_ood = recall(lv_pca), recall(lv_ood)
        assert r_ood >= 0.95, (r_pca, r_ood)
        assert r_ood >= r_pca + 0.3, (r_pca, r_ood)

    def test_query_aware_matches_pca_in_distribution(self, rng):
        """When queries ARE the data distribution the OOD solution must not
        be worse than PCA (it reduces to PCA up to rotation/scaling)."""
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecDataset)
        basis = np.linalg.qr(rng.normal(size=(32, 32)))[0].astype(np.float32)
        scales = np.geomspace(10, 0.1, 32).astype(np.float32)
        data = ((rng.normal(size=(2000, 32)) * scales) @ basis
                ).astype(np.float32)
        queries = ((rng.normal(size=(200, 32)) * scales) @ basis
                   ).astype(np.float32)
        k = 10
        gt = np.argsort(-(queries @ data.T), axis=1)[:, :k]

        def recall(lv):
            px = (data - lv.mean) @ lv.projection
            pq = lv.project_queries(queries)
            ids = np.argsort(-(pq @ px.T), axis=1)[:, :k]
            hits = sum(len(set(a) & set(b)) for a, b in zip(ids, gt))
            return hits / (len(queries) * k)

        r_pca = recall(LeanVecDataset.train(data, target_dim=12))
        r_ood = recall(LeanVecDataset.train(data, target_dim=12,
                                            queries=queries[:100]))
        assert r_ood >= r_pca - 0.05, (r_pca, r_ood)

    def test_query_aware_persistence(self, tmp_path, rng):
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecDataset)
        data = rng.normal(size=(300, 24)).astype(np.float32)
        queries = rng.normal(size=(64, 24)).astype(np.float32) * \
            np.geomspace(5, 0.1, 24).astype(np.float32)
        lv = LeanVecDataset.train(data, target_dim=8, queries=queries)
        assert lv.query_projection is not lv.projection
        lv.save_to(str(tmp_path / "lv"))
        lv2 = LeanVecDataset.load_from(str(tmp_path / "lv"))
        np.testing.assert_allclose(lv2.projection, lv.projection, atol=1e-6)
        np.testing.assert_allclose(lv2.query_projection,
                                   lv.query_projection, atol=1e-6)
        np.testing.assert_allclose(lv2.project_queries(queries),
                                   lv.project_queries(queries), atol=1e-4)

    def test_leanvec_save_assemble(self, tmp_path, small_dataset):
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecVamana)
        data, queries = small_dataset
        params = VamanaBuildParameters(graph_max_degree=16, window_size=32,
                                       alpha=1.1)
        lvv = LeanVecVamana.build(params, data[:500], "l2", target_dim=24)
        lvv.save(str(tmp_path / "lv"))
        lvv2 = LeanVecVamana.assemble(str(tmp_path / "lv"))
        a = lvv.search(queries[:8], 5)
        b = lvv2.search(queries[:8], 5)
        np.testing.assert_array_equal(a.ids, b.ids)


class TestTwoLevelRerankPool:
    """Two-level serving capacity semantics (round 5): DEFAULTED configs
    widen retention to 2x the window for the rerank pool; an EXPLICIT
    window/capacity split is honored as given (the old unconditional 2x
    floor silently overrode explicit splits, making capacity sweeps
    unfalsifiable)."""

    def _captured_capacity(self, idx, queries, monkeypatch):
        from scalablevectorsearch_tpu.index.vamana import index as idx_mod
        seen = {}
        real = idx_mod._search_batch

        def spy(*args, **kwargs):
            seen["capacity"] = kwargs["capacity"]
            seen["window"] = kwargs["window"]
            return real(*args, **kwargs)

        monkeypatch.setattr(idx_mod, "_search_batch", spy)
        idx.search(queries[:8], 5)
        return seen

    def test_defaulted_widens_explicit_honored(self, rng, monkeypatch):
        import numpy as np
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        from scalablevectorsearch_tpu.index.vamana.params import (
            SearchBufferConfig, VamanaBuildParameters,
            VamanaSearchParameters)
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        x = rng.normal(size=(600, 24)).astype(np.float32)
        queries = rng.normal(size=(8, 24)).astype(np.float32)
        lvq = LVQDataset.compress(x, bits=8, residual_bits=8)
        params = VamanaBuildParameters(graph_max_degree=12, window_size=24,
                                       max_candidate_pool_size=48,
                                       prune_to=10)
        idx = VamanaIndex.build(params, x, "l2")
        idx = VamanaIndex(idx.graph, lvq, idx.entry_point, idx.distance)

        idx.search_window_size = 12            # defaulted capacity
        seen = self._captured_capacity(idx, queries, monkeypatch)
        assert seen == {"window": 12, "capacity": 24}

        idx.search_parameters = VamanaSearchParameters(
            buffer_config=SearchBufferConfig(12, 15))    # explicit split
        seen = self._captured_capacity(idx, queries, monkeypatch)
        assert seen == {"window": 12, "capacity": 15}


class TestLVQHostSaveParity:
    @pytest.mark.parametrize("bits,residual", [(8, 0), (8, 8), (4, 8),
                                               (4, 4), (8, 4)])
    def test_byte_parity_with_device_save(self, tmp_path, rng, bits,
                                          residual):
        """compress_and_save_host re-implements the quantization math and
        the v0.0.2 table; it must stay byte-compatible with
        LVQDataset.compress + save for every (bits, residual_bits) combo
        (the judged 10M compressed cache is written by the host path —
        round-5 review asked for this gate)."""
        import numpy as np
        from scalablevectorsearch_tpu.core.loading import dispatch_load
        from scalablevectorsearch_tpu.lib import saveload
        from scalablevectorsearch_tpu.quantization import lvq as lvq_mod
        x = rng.normal(size=(97, 13)).astype(np.float32)
        mem = lvq_mod.LVQDataset.compress(x, bits=bits,
                                          residual_bits=residual)
        saveload.save_to_disk(mem, str(tmp_path / "dev"))
        lvq_mod.compress_and_save_host(str(tmp_path / "host"), x,
                                       bits=bits, residual_bits=residual)
        a = dispatch_load(str(tmp_path / "dev"))
        b = dispatch_load(str(tmp_path / "host"))
        np.testing.assert_array_equal(np.asarray(a.codes),
                                      np.asarray(b.codes))
        np.testing.assert_array_equal(np.asarray(a.res_codes),
                                      np.asarray(b.res_codes))
        for field in ("scales", "biases", "mean", "res_scales",
                      "norms_sq", "full_norms_sq"):
            av, bv = np.asarray(getattr(a, field)), \
                np.asarray(getattr(b, field))
            fin = np.isfinite(av)
            np.testing.assert_allclose(av[fin], bv[fin], rtol=3e-5)
            np.testing.assert_array_equal(fin, np.isfinite(bv))
        assert (a.bits, a.residual_bits) == (b.bits, b.residual_bits)
