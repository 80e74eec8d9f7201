"""Unit tests for the core layer: datasets, graph, io, recall, medioid,
translation, kmeans — mirrors the reference's tests/svs/core/ coverage."""

import os

import numpy as np
import pytest

from scalablevectorsearch_tpu.core import io as svio
from scalablevectorsearch_tpu.core.data import VectorDataset
from scalablevectorsearch_tpu.core.graph import NeighborGraph, SENTINEL
from scalablevectorsearch_tpu.core.kmeans import kmeans_clustering
from scalablevectorsearch_tpu.core.medioid import compute_medioid
from scalablevectorsearch_tpu.core.recall import k_recall_at_n
from scalablevectorsearch_tpu.core.translation import IDTranslator
from scalablevectorsearch_tpu.lib import saveload

import jax.numpy as jnp


class TestVecsIO:
    @pytest.mark.parametrize("ext,dtype", [
        (".fvecs", np.float32), (".ivecs", np.int32),
        (".bvecs", np.uint8), (".hvecs", np.float16)])
    def test_roundtrip(self, tmp_path, rng, ext, dtype):
        if np.issubdtype(dtype, np.floating):
            x = rng.normal(size=(17, 9)).astype(dtype)
        else:
            x = rng.integers(0, 100, size=(17, 9)).astype(dtype)
        path = str(tmp_path / f"data{ext}")
        svio.write_vecs(path, x)
        y = svio.read_vecs(path)
        assert y.dtype == dtype
        np.testing.assert_array_equal(x, y)

    def test_max_rows(self, tmp_path, rng):
        x = rng.normal(size=(10, 4)).astype(np.float32)
        path = str(tmp_path / "d.fvecs")
        svio.write_vecs(path, x)
        y = svio.read_vecs(path, max_rows=3)
        np.testing.assert_array_equal(x[:3], y)

    def test_corrupt(self, tmp_path):
        path = str(tmp_path / "bad.fvecs")
        with open(path, "wb") as f:
            f.write(b"\x04\x00\x00\x00abc")  # truncated row
        with pytest.raises(ValueError):
            svio.read_vecs(path)


class TestVectorDataset:
    def test_from_array_padding(self, rng):
        x = rng.normal(size=(10, 48)).astype(np.float32)
        ds = VectorDataset.from_array(x)
        assert ds.n == 10 and ds.dim == 48
        assert ds.vectors.shape == (16, 128)
        np.testing.assert_allclose(ds.to_numpy(), x, rtol=1e-6)
        norms = np.asarray(ds.norms_sq)
        np.testing.assert_allclose(norms[:10], (x ** 2).sum(1), rtol=1e-5)
        assert np.all(np.isinf(norms[10:]))

    def test_get_clamps(self, rng):
        x = rng.normal(size=(4, 8)).astype(np.float32)
        ds = VectorDataset.from_array(x)
        got = ds.get(jnp.array([0, 3, 100]))
        np.testing.assert_allclose(np.asarray(got)[1, :8], x[3], rtol=1e-6)

    def test_set_rows_and_grow(self, rng):
        x = rng.normal(size=(8, 16)).astype(np.float32)
        ds = VectorDataset.from_array(x, capacity=32)
        assert ds.capacity == 32
        new_rows = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        ds2 = ds.set_rows(8, new_rows, new_n=12)
        assert ds2.n == 12
        np.testing.assert_allclose(np.asarray(ds2.vectors[8:12]),
                                   np.asarray(new_rows), rtol=1e-6)
        ds3 = ds2.with_capacity(100)
        assert ds3.capacity >= 100
        np.testing.assert_allclose(ds3.to_numpy()[:8, :16], x, rtol=1e-6)

    def test_save_load(self, tmp_path, rng):
        x = rng.normal(size=(10, 20)).astype(np.float32)
        ds = VectorDataset.from_array(x)
        saveload.save_to_disk(ds, str(tmp_path / "data"))
        ds2 = saveload.load_from_disk(VectorDataset, str(tmp_path / "data"))
        np.testing.assert_allclose(ds2.to_numpy(), x, rtol=1e-6)
        assert ds2.n == 10 and ds2.dim == 20

    def test_save_load_bf16(self, tmp_path, rng):
        """np.save stores extension dtypes (bfloat16) as raw void bytes —
        the loader must view them back through the recorded eltype (the
        10M bf16 IVF posting layout persists through this path)."""
        import jax.numpy as jnp
        x = rng.normal(size=(10, 20)).astype(np.float32)
        ds = VectorDataset.from_array(x, dtype=jnp.bfloat16)
        saveload.save_to_disk(ds, str(tmp_path / "bf16"))
        ds2 = saveload.load_from_disk(VectorDataset, str(tmp_path / "bf16"))
        assert ds2.dtype == jnp.bfloat16
        assert bool(jnp.all(ds2.vectors == ds.vectors))


class TestNeighborGraph:
    def test_empty_and_replace(self):
        g = NeighborGraph.empty(10, 4)
        assert g.adjacency.shape == (16, 4)
        ids = jnp.array([2, 5])
        rows = jnp.array([[1, 3, SENTINEL, SENTINEL],
                          [0, SENTINEL, SENTINEL, SENTINEL]], dtype=jnp.int32)
        g2 = g.replace_rows(ids, rows, jnp.array([2, 1], dtype=jnp.int32))
        nbrs = np.asarray(g2.neighbors(jnp.array([2])))
        np.testing.assert_array_equal(nbrs[0], [1, 3, SENTINEL, SENTINEL])
        assert int(g2.degrees[5]) == 1

    def test_scatter_edges(self):
        g = NeighborGraph.empty(8, 4)
        dst = jnp.array([1, 1, 2, 3], dtype=jnp.int32)
        slot = jnp.array([0, 1, 0, 0], dtype=jnp.int32)
        src = jnp.array([5, 6, 7, 0], dtype=jnp.int32)
        valid = jnp.array([True, True, True, False])
        g2 = g.scatter_edges(dst, slot, src, valid)
        adj = np.asarray(g2.adjacency)
        np.testing.assert_array_equal(adj[1], [5, 6, SENTINEL, SENTINEL])
        assert adj[2, 0] == 7
        assert adj[3, 0] == SENTINEL  # invalid dropped
        deg = np.asarray(g2.degrees)
        assert deg[1] == 2 and deg[2] == 1 and deg[3] == 0

    def test_clear_rows(self):
        g = NeighborGraph.from_array(
            np.array([[1, 2], [0, 2], [0, 1]], dtype=np.int32))
        g2 = g.clear_rows(jnp.array([1]))
        adj = np.asarray(g2.adjacency)
        assert (adj[1] == SENTINEL).all()
        assert int(g2.degrees[1]) == 0 and int(g2.degrees[0]) == 2

    def test_save_load(self, tmp_path):
        adj = np.array([[1, 2, SENTINEL], [0, SENTINEL, SENTINEL],
                        [0, 1, SENTINEL]], dtype=np.int32)
        g = NeighborGraph.from_array(adj)
        saveload.save_to_disk(g, str(tmp_path / "graph"))
        g2 = saveload.load_from_disk(NeighborGraph, str(tmp_path / "graph"))
        np.testing.assert_array_equal(g2.to_numpy(), adj)
        assert g2.max_degree == 3 and g2.n == 3


class TestRecall:
    def test_exact(self):
        gt = np.array([[1, 2, 3], [4, 5, 6]])
        assert k_recall_at_n(gt, gt) == 1.0

    def test_partial(self):
        gt = np.array([[1, 2], [3, 4]])
        res = np.array([[1, 9], [4, 3]])
        assert k_recall_at_n(gt, res) == pytest.approx(0.75)

    def test_k_at_n(self):
        gt = np.array([[1, 2, 3, 4]])
        res = np.array([[9, 9, 1, 9, 2]])
        assert k_recall_at_n(gt, res, n=5, k=2) == pytest.approx(1.0)
        with pytest.raises(ValueError):
            k_recall_at_n(gt, res, n=2, k=5)


class TestMedioid:
    def test_matches_numpy(self, rng):
        x = rng.normal(size=(100, 16)).astype(np.float32)
        ds = VectorDataset.from_array(x)
        m = compute_medioid(ds)
        mean = x.mean(axis=0)
        expected = int(np.argmin(((x - mean) ** 2).sum(1)))
        assert m == expected


class TestIDTranslator:
    def test_insert_lookup(self):
        t = IDTranslator()
        t.insert([100, 200, 300], [0, 1, 2])
        np.testing.assert_array_equal(t.to_external([0, 1, 2]), [100, 200, 300])
        np.testing.assert_array_equal(t.to_internal([300, 100]), [2, 0])
        assert 200 in t and 201 not in t

    def test_duplicate_raises(self):
        t = IDTranslator()
        t.insert([1], [0])
        with pytest.raises(ValueError):
            t.insert([1], [5])

    def test_remove_and_remap(self):
        t = IDTranslator()
        t.insert([10, 20, 30], [0, 1, 2])
        slots = t.remove([20])
        assert slots.tolist() == [1]
        assert t.to_external([1]).tolist() == [-1]
        t.remap({2: 1})
        np.testing.assert_array_equal(t.to_internal([30]), [1])


class TestKMeans:
    def test_separated_clusters(self):
        local_rng = np.random.default_rng(77)
        centers = np.array([[0, 0], [100, 100], [-100, 100]], dtype=np.float32)
        x = np.concatenate([
            centers[i] + local_rng.normal(size=(50, 2)).astype(np.float32)
            for i in range(3)])
        cents, assign = kmeans_clustering(x, 3, num_iterations=20, seed=0)
        # each true cluster maps to one learned cluster
        for i in range(3):
            labels = assign[i * 50:(i + 1) * 50]
            assert len(np.unique(labels)) == 1
        assert len(np.unique(assign)) == 3


class TestSvsNativeFormat:
    def test_roundtrip(self, tmp_path, rng):
        x = rng.normal(size=(20, 7)).astype(np.float32)
        path = str(tmp_path / "d.svs")
        svio.write_svs(path, x)
        np.testing.assert_array_equal(svio.read_svs(path), x)
        np.testing.assert_array_equal(svio.read_any(path), x)

    def test_bad_magic(self, tmp_path):
        path = str(tmp_path / "bad.svs")
        with open(path, "wb") as f:
            f.write(b"\x00" * svio.SVS_V1_HEADER_SIZE)
        with pytest.raises(ValueError):
            svio.read_svs(path)

    def test_uuid_header_roundtrip(self, tmp_path, rng):
        """write_svs embeds the requested UUID in lib::UUID raw order and
        read_svs_uuid recovers the canonical string (lib/uuid.h flip())."""
        x = rng.normal(size=(3, 5)).astype(np.float32)
        path = str(tmp_path / "u.svs")
        u = "0cd42b81-8e7a-4fdd-b4d6-81d6d5880fb0"
        assert svio.write_svs(path, x, uuid=u) == u
        assert svio.read_svs_uuid(path) == u
        assert svio.find_svs_by_uuid(str(tmp_path), u) == path
        assert svio.find_svs_by_uuid(
            str(tmp_path), "00000000-0000-0000-0000-000000000000") is None

    def test_reads_upstream_blob(self):
        """Parse an actual reference-produced .svs blob byte-for-byte
        (1024-byte v1 header: magic, uuid, n, d — io/native.h:315-341)."""
        path = "/root/reference/data/test_dataset/known_f32.svs"
        if not os.path.exists(path):
            pytest.skip("reference checkout not present")
        arr = svio.read_svs(path, dtype=np.float32)
        assert arr.shape == (5, 6)
        assert np.isfinite(arr).all()
        # the upstream ivf_clustering config's uuid resolves to its blob
        d = "/root/reference/data/test_dataset/ivf_clustering"
        got = svio.find_svs_by_uuid(
            d, "0cd42b81-8e7a-4fdd-b4d6-81d6d5880fb0")
        assert got is not None and got.endswith("data_1.svs")

    def test_size_mismatch(self, tmp_path, rng):
        x = rng.normal(size=(4, 4)).astype(np.float32)
        path = str(tmp_path / "t.svs")
        svio.write_svs(path, x)
        with pytest.raises(ValueError):
            svio.read_svs(path, dtype=np.float64)  # wrong itemsize


class TestHostSideSaves:
    """Host-side checkpoint writers must be byte-compatible with the
    device-readback save paths (multi-GB blocking device->host reads crawl
    at ~2 MB/s through the remote-TPU tunnel — PERF.md round 4)."""

    def test_save_vectors_host_roundtrip(self, tmp_path, rng):
        from scalablevectorsearch_tpu.core.data import save_vectors_host
        from scalablevectorsearch_tpu.lib import saveload
        x = rng.normal(size=(333, 17)).astype(np.float32)
        ds = VectorDataset.from_array(x)
        saveload.save_to_disk(ds, str(tmp_path / "dev"))
        save_vectors_host(str(tmp_path / "host"), x)
        a = saveload.load_from_disk(VectorDataset, str(tmp_path / "dev"))
        b = saveload.load_from_disk(VectorDataset, str(tmp_path / "host"))
        np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())
        assert a.n == b.n and a.dim == b.dim

    def test_save_vectors_host_bf16(self, tmp_path, rng):
        import jax.numpy as jnp
        from scalablevectorsearch_tpu.core.data import save_vectors_host
        from scalablevectorsearch_tpu.lib import saveload
        x = rng.normal(size=(64, 8)).astype(np.float32)
        save_vectors_host(str(tmp_path / "bf16"), x, eltype="bfloat16")
        ds = saveload.load_from_disk(VectorDataset, str(tmp_path / "bf16"))
        assert ds.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(ds.to_numpy(), np.float32), x, rtol=1e-2, atol=1e-2)

    def test_save_adjacency_host_roundtrip(self, tmp_path, rng):
        from scalablevectorsearch_tpu.core.graph import save_adjacency_host
        from scalablevectorsearch_tpu.lib import saveload
        adj = rng.integers(0, 500, size=(501, 9)).astype(np.int32)
        adj[:, 5:] = SENTINEL
        g = NeighborGraph.from_array(adj)
        saveload.save_to_disk(g, str(tmp_path / "dev"))
        save_adjacency_host(str(tmp_path / "host"), adj)
        a = saveload.load_from_disk(NeighborGraph, str(tmp_path / "dev"))
        b = saveload.load_from_disk(NeighborGraph, str(tmp_path / "host"))
        np.testing.assert_array_equal(np.asarray(a.adjacency),
                                      np.asarray(b.adjacency))
        np.testing.assert_array_equal(np.asarray(a.degrees),
                                      np.asarray(b.degrees))
        assert a.n == b.n and a.max_degree == b.max_degree


class TestDatasetDistributions:
    """generate_test_dataset distribution modes (round-4 VERDICT weak-5:
    every benchmark number came from one easy clustered synthetic)."""

    def test_uniform_has_no_cluster_structure(self):
        xc, _ = svio.generate_test_dataset(2000, 10, 32, seed=3)
        xu, qu = svio.generate_test_dataset(2000, 10, 32, seed=3,
                                            distribution="uniform")
        assert xu.shape == (2000, 32) and qu.shape == (10, 32)
        # clustered data has much larger spread (centers at scale 10)
        assert xc.std() > 3 * xu.std()
        assert abs(xu.mean()) < 0.05 and abs(xu.std() - 1.0) < 0.05

    def test_overlap_sits_between(self):
        xc, _ = svio.generate_test_dataset(4000, 10, 16, seed=5)
        xo, _ = svio.generate_test_dataset(4000, 10, 16, seed=5,
                                           distribution="overlap")
        xu, _ = svio.generate_test_dataset(4000, 10, 16, seed=5,
                                           distribution="uniform")
        assert xu.std() < xo.std() < xc.std()

    def test_unknown_distribution_raises(self):
        with pytest.raises(ValueError):
            svio.generate_test_dataset(10, 2, 4, distribution="nope")
