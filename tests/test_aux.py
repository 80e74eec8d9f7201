"""Auxiliary subsystem tests: cancellation, upgrader, native IO, logging."""

import json
import os

import numpy as np
import pytest

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.lib import native
from scalablevectorsearch_tpu.lib.exceptions import ANNException, \
    SearchCancelled
from scalablevectorsearch_tpu.utils import upgrader


@pytest.fixture(scope="module")
def tiny_index(small_dataset):
    data, queries = small_dataset
    return svt.FlatIndex.from_array(data[:500], query_batch_size=16), \
        queries


class TestCancellation:
    def test_cancel_fires(self, tiny_index):
        index, queries = tiny_index
        calls = [0]

        def cancel():
            calls[0] += 1
            return calls[0] > 2

        with pytest.raises(SearchCancelled):
            index.search(queries[:100], 5, cancel=cancel)
        assert calls[0] == 3
        assert issubclass(SearchCancelled, ANNException)

    def test_no_cancel_is_normal(self, tiny_index):
        index, queries = tiny_index
        res = index.search(queries[:8], 5, cancel=lambda: False)
        assert res.ids.shape == (8, 5)

    def test_vamana_cancel(self, small_dataset):
        data, queries = small_dataset
        params = svt.VamanaBuildParameters(graph_max_degree=16,
                                           window_size=32)
        idx = svt.VamanaIndex.build(params, data[:500], "l2", batch_size=128,
                                    query_batch_size=16)
        with pytest.raises(SearchCancelled):
            idx.search(queries[:100], 5, cancel=lambda: True)

    def test_every_index_cancels(self, small_dataset):
        """Cancel predicates thread through EVERY search entry point, like
        the reference (tests/integration/cancel.cpp covers all index
        kinds)."""
        from scalablevectorsearch_tpu.index.dynamic_flat import \
            DynamicFlatIndex
        from scalablevectorsearch_tpu.index.inverted.index import (
            InvertedBuildParameters, InvertedIndex)
        from scalablevectorsearch_tpu.index.ivf.clustering import Clustering
        from scalablevectorsearch_tpu.index.ivf.dynamic import \
            DynamicIVFIndex
        from scalablevectorsearch_tpu.index.ivf.index import IVFIndex
        data, queries = small_dataset
        n = 400
        ivf_params = svt.IVFBuildParameters(num_centroids=8,
                                            is_hierarchical=False)
        clustering = Clustering.build(ivf_params, data[:n])
        indexes = [
            DynamicFlatIndex(data[:n], np.arange(n), "l2",
                             query_batch_size=16),
            IVFIndex.build(ivf_params, data[:n], "l2", query_batch_size=16),
            InvertedIndex.build(InvertedBuildParameters(), data[:n], "l2",
                                query_batch_size=16),
            svt.MutableVamanaIndex(
                svt.VamanaBuildParameters(graph_max_degree=16,
                                          window_size=24),
                data[:n], np.arange(n), "l2", query_batch_size=16),
            DynamicIVFIndex(clustering, data[:n], np.arange(n), "l2",
                            query_batch_size=16),
        ]
        for idx in indexes:
            with pytest.raises(SearchCancelled):
                idx.search(queries[:100], 5, cancel=lambda: True)
            res = idx.search(queries[:8], 5, cancel=lambda: False)
            assert res.ids.shape == (8, 5)


class TestUpgrader:
    def test_inspect_current_checkpoint(self, tmp_path, small_dataset):
        data, _ = small_dataset
        index = svt.FlatIndex.from_array(data[:100])
        index.save(str(tmp_path / "ck"))
        report = upgrader.inspect(str(tmp_path / "ck"))
        assert len(report) >= 2
        assert all(e["status"] == "up-to-date" for e in report)

    def test_upgrade_applies_migration(self, tmp_path):
        # fabricate a stale table + a migration for it
        d = tmp_path / "old"
        d.mkdir()
        with open(d / "svs_config.json", "w") as f:
            json.dump({"__schema__": "uncompressed_data",
                       "__version__": "v0.0.1", "dims": 4}, f)

        @upgrader.register_migration("uncompressed_data", "v0.0.1")
        def migrate(table, directory):
            table["__version__"] = "v0.0.2"
            table["migrated"] = True
            return table

        try:
            actions = upgrader.upgrade(str(d))
            assert any(a["action"] == "upgraded" for a in actions)
            with open(d / "svs_config.json") as f:
                table = json.load(f)
            assert table["__version__"] == "v0.0.2" and table["migrated"]
            assert os.path.exists(str(d) + ".bak")
        finally:
            upgrader._MIGRATIONS.pop(("uncompressed_data", "v0.0.1"), None)

    def test_current_versions_derive_from_classes(self):
        """The registry is introspected, so it cannot drift from the code
        (round-3 VERDICT: a hardcoded table had already drifted for LVQ)."""
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        versions = upgrader.current_versions()
        assert versions["lvq_dataset"] == str(LVQDataset.VERSION)
        for cls in upgrader._saveable_classes():
            assert versions[cls.SCHEMA] == str(cls.VERSION), cls

    def test_saveable_module_list_cannot_drift(self):
        """_saveable_classes enumerates modules by hand; a saveable class in
        a module missing from that list would silently report unknown-schema
        in inspect().  Grep the package for SCHEMA declarations and assert
        every one is registered (round-4 ADVICE)."""
        import re

        import scalablevectorsearch_tpu as pkg
        root = os.path.dirname(pkg.__file__)
        declared = set()
        for dirpath, _dirs, files in os.walk(root):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                with open(os.path.join(dirpath, fname)) as f:
                    declared.update(re.findall(
                        r'^\s*SCHEMA\s*=\s*["\']([^"\']+)["\']',
                        f.read(), re.MULTILINE))
        assert declared, "grep found no SCHEMA declarations"
        registered = set(upgrader.current_versions())
        missing = declared - registered
        assert not missing, (
            f"saveable schemas missing from upgrader._saveable_classes: "
            f"{sorted(missing)}")

    def test_every_dataset_kind_up_to_date(self, tmp_path, rng):
        """Save every dataset kind; inspect must report all up-to-date."""
        from scalablevectorsearch_tpu.core.data import VectorDataset
        from scalablevectorsearch_tpu.lib import saveload
        from scalablevectorsearch_tpu.quantization.leanvec import (
            LeanVecDataset)
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        from scalablevectorsearch_tpu.quantization.scalar import SQDataset
        x = rng.normal(size=(64, 20)).astype(np.float32)
        root = tmp_path / "kinds"
        saveload.save_to_disk(VectorDataset.from_array(x),
                              str(root / "uncompressed"))
        saveload.save_to_disk(SQDataset.compress(x), str(root / "sq"))
        saveload.save_to_disk(LVQDataset.compress(x, bits=4,
                                                  residual_bits=8),
                              str(root / "lvq"))
        LeanVecDataset.train(x, target_dim=8,
                             queries=x[:16]).save_to(str(root / "leanvec"))
        report = upgrader.inspect(str(root))
        # leanvec dir nests two LVQ checkpoints + its own table => >= 6
        assert len(report) >= 6
        bad = [e for e in report if e["status"] != "up-to-date"]
        assert not bad, bad

    LEGACY_DIR = os.path.join(os.path.dirname(__file__), "..", "data",
                              "legacy")

    @pytest.mark.parametrize("fixture,bits,residual_bits", [
        ("lvq8_v001", 8, 0), ("lvq4x8_v001", 4, 8)])
    def test_legacy_lvq_fixture_upgrades(self, tmp_path, fixture, bits,
                                         residual_bits):
        """Committed v0.0.1 LVQ checkpoints (unpadded/unpacked codes) must
        inspect as upgradable, migrate in place, and load to the exact
        reconstruction a fresh compress produces (the fixture data is
        seeded; see data/legacy/make_fixtures.py)."""
        import shutil

        from scalablevectorsearch_tpu.lib import saveload
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        src = os.path.join(self.LEGACY_DIR, fixture)
        ck = tmp_path / fixture
        shutil.copytree(src, ck)
        (before,) = upgrader.inspect(str(ck))
        assert before["status"] == "upgradable", before
        actions = upgrader.upgrade(str(ck), backup=False)
        assert any(a["action"] == "upgraded" for a in actions)
        (after,) = upgrader.inspect(str(ck))
        assert after["status"] == "up-to-date", after
        ds = saveload.load_from_disk(LVQDataset, str(ck))
        x = np.random.default_rng(7).normal(size=(48, 20)).astype(np.float32)
        fresh = LVQDataset.compress(x, bits=bits,
                                    residual_bits=residual_bits)
        np.testing.assert_allclose(ds.to_numpy(), fresh.to_numpy(),
                                   atol=1e-5)

    def test_legacy_vamana_params_fixture(self, tmp_path):
        import shutil
        src = os.path.join(self.LEGACY_DIR, "vamana_params_v001")
        ck = tmp_path / "vp"
        shutil.copytree(src, ck)
        upgrader.upgrade(str(ck), backup=False)
        with open(ck / "svs_config.json") as f:
            table = json.load(f)
        assert table["__version__"] == "v0.0.2"
        assert "entry_sampler" in table and table["entry_sampler"] is None


class TestNativeIO:
    def test_native_matches_numpy(self, tmp_path, rng):
        if not native.available():
            pytest.skip("native library not built")
        x = rng.normal(size=(257, 33)).astype(np.float32)
        path = str(tmp_path / "x.fvecs")
        svt.write_vecs(path, x)
        y = svt.read_vecs(path)           # native path
        np.testing.assert_array_equal(x, y)
        n, dim = native.probe_vecs(path, 4)
        assert (n, dim) == (257, 33)

    def test_native_rejects_corrupt(self, tmp_path):
        if not native.available():
            pytest.skip("native library not built")
        path = str(tmp_path / "bad.fvecs")
        with open(path, "wb") as f:
            f.write(b"\x05\x00\x00\x00short")
        with pytest.raises(ValueError):
            svt.read_vecs(path)
