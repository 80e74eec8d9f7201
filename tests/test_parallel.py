"""Multi-device sharding tests on the 8-virtual-CPU-device mesh — the analog
of the reference's threadpool/NUMA coverage, exercised the way the driver's
dryrun does (SURVEY §4 TPU translation note)."""

import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.core.data import VectorDataset
from scalablevectorsearch_tpu.core.graph import NeighborGraph
from scalablevectorsearch_tpu.index.vamana.search import (
    default_max_iters, greedy_search)
from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
from scalablevectorsearch_tpu.parallel import mesh as mesh_mod
from scalablevectorsearch_tpu.parallel import sharded


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestShardedFlat:
    @pytest.mark.parametrize("distance", ["l2", "mip"])
    def test_matches_single_device(self, eight_devices, distance):
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        data, queries = svt.generate_test_dataset(3000, 40, 32, seed=11)
        ds = sharded.shard_dataset(VectorDataset.from_array(data), mesh)
        q = jnp.asarray(pad_matrix(queries))
        keys, ids = sharded.sharded_flat_search(mesh, ds, q, 10, distance,
                                                tile=128)
        gt = svt.exhaustive_search(data, queries, 10, distance=distance)
        assert svt.k_recall_at_n(gt.ids, np.asarray(ids)[:40]) >= 0.999

    def test_global_ids_cover_all_shards(self, eight_devices):
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        rng = np.random.default_rng(0)
        data = rng.normal(size=(800, 16)).astype(np.float32)
        ds = sharded.shard_dataset(VectorDataset.from_array(data), mesh)
        # query = each of 8 evenly spaced dataset rows -> nearest is itself
        picks = np.arange(0, 800, 100)
        q = jnp.asarray(pad_matrix(data[picks]))
        keys, ids = sharded.sharded_flat_search(mesh, ds, q, 1, "l2",
                                                tile=128)
        np.testing.assert_array_equal(np.asarray(ids)[: len(picks), 0], picks)


class TestDpSearch:
    def test_matches_single_device(self, eight_devices):
        mesh = mesh_mod.make_mesh(8, axis_name="dp")
        data, queries = svt.generate_test_dataset(2000, 64, 32, seed=3)
        ds = VectorDataset.from_array(data)
        rng = np.random.default_rng(1)
        adj = rng.integers(0, 2000, size=(2000, 12)).astype(np.int32)
        graph = NeighborGraph.from_array(adj)
        q = jnp.asarray(pad_matrix(queries))
        entry = jnp.asarray([0], dtype=jnp.int32)
        kwargs = dict(window=16, capacity=16, max_iters=48, distance="l2")
        single = greedy_search(graph, ds, q, entry, **kwargs)
        multi = sharded.dp_greedy_search(mesh, graph, ds, q, entry, **kwargs)
        np.testing.assert_array_equal(np.asarray(single.ids),
                                      np.asarray(multi.ids))


class TestDpBuildRound:
    def test_round_executes_and_commits(self, eight_devices):
        mesh = mesh_mod.make_mesh(8, axis_name="dp")
        data, _ = svt.generate_test_dataset(512, 8, 16, seed=5)
        ds = VectorDataset.from_array(data)
        graph = NeighborGraph.empty(512, 8)
        b = 64
        ids = jnp.arange(b, dtype=jnp.int32)
        valid = jnp.ones((b,), bool)
        g2, dropped = sharded.dp_build_round(
            mesh, graph, ds, ids, valid, jnp.asarray([0], jnp.int32),
            window=16, capacity=16, max_iters=default_max_iters(16),
            distance="l2", pool_size=32, gen_alpha=1.2, rev_alpha=1.2,
            prune_to=8, max_degree=8, prune_chunk=8)
        degs = np.asarray(g2.degrees[:b])
        assert degs.max() <= 8
        assert degs[1:].min() >= 1  # every non-entry node got linked


class TestShardedIVF:
    def test_matches_single_device(self, eight_devices, monkeypatch):
        # parity check vs the sharded path (which takes pre-padded f32
        # queries): pin full-width uploads so the single-device reference
        # is not perturbed by the f16 serving default
        monkeypatch.setenv("SVT_QUERY_UPLOAD_DTYPE", "float32")
        import scalablevectorsearch_tpu as svt
        from scalablevectorsearch_tpu.index.ivf.index import IVFIndex
        from scalablevectorsearch_tpu.index.ivf.params import (
            IVFBuildParameters, IVFSearchParameters)
        from scalablevectorsearch_tpu.lib.datatypes import pad_matrix

        data, queries = svt.generate_test_dataset(3000, 40, 32, seed=13)
        params = IVFBuildParameters(num_centroids=64, num_iterations=4,
                                    training_fraction=0.5,
                                    is_hierarchical=False)
        index = IVFIndex.build(params, data, "l2")
        single = index.search(queries, 10,
                              IVFSearchParameters(n_probes=16))
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        q = jnp.asarray(pad_matrix(queries))
        keys, ids = sharded.sharded_ivf_search(mesh, index, q, 10,
                                               n_probes=16)
        got = np.asarray(ids)[:40]
        # identical candidate sets modulo distance ties
        agree = (got == single.ids).mean()
        assert agree > 0.98, agree


class TestShardedGraph:
    """Graph rows + vectors sharded across devices (SURVEY §7 step 8): the
    sharded search must be bit-identical to single-chip, and the sharded
    build must produce the identical graph for an identical batch schedule
    (the round math is deterministic)."""

    def _index(self, n=2000, d=32, r=12, seed=3):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d)).astype(np.float32)
        data = VectorDataset.from_array(x)
        adj = rng.integers(0, n, size=(n, r)).astype(np.int32)
        graph = NeighborGraph.from_array(adj)
        queries = jnp.asarray(pad_matrix(
            rng.normal(size=(16, d)).astype(np.float32)))
        return x, data, graph, queries

    def test_search_bit_identical(self, eight_devices):
        x, data, graph, queries = self._index()
        eids = jnp.asarray([0], jnp.int32)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        kw = dict(window=16, capacity=16, max_iters=40, distance="l2")
        ref = greedy_search(graph, data, queries, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, graph, data, queries,
                                            eids, **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out.ids))
        fin = np.isfinite(np.asarray(ref.keys))
        np.testing.assert_allclose(
            np.where(fin, np.asarray(out.keys), 0),
            np.where(fin, np.asarray(ref.keys), 0), rtol=1e-5)

    def test_search_with_sampler_bit_identical(self, eight_devices):
        """Per-query sampled entries over a sharded graph: the replicated
        sample selects the same entries on every device, so results are
        bit-identical to single-chip greedy with the same selection."""
        from scalablevectorsearch_tpu.index.vamana.entry import build_sampler
        x, data, graph, queries = self._index()
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        kw = dict(window=16, capacity=16, max_iters=40, distance="l2")
        sampler = build_sampler(data, 64, seed=2)
        eids = sampler.select("l2", queries)
        ref = greedy_search(graph, data, queries, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, graph, data, queries,
                                            jnp.asarray([0], jnp.int32),
                                            sampler=sampler, **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out.ids))
        # dp path: sampler shards along queries with no collectives
        mesh_dp = mesh_mod.make_mesh(8, axis_name="dp")
        out_dp = sharded.dp_greedy_search(mesh_dp, graph, data, queries,
                                          jnp.asarray([0], jnp.int32),
                                          sampler=sampler, axis="dp", **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out_dp.ids))

    def test_search_with_pool_tracking(self, eight_devices):
        x, data, graph, queries = self._index()
        eids = jnp.asarray([0], jnp.int32)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        kw = dict(window=16, capacity=16, max_iters=40, distance="l2",
                  pool_size=32)
        ref = greedy_search(graph, data, queries, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, graph, data, queries,
                                            eids, **kw)
        np.testing.assert_array_equal(np.asarray(ref.pool_ids),
                                      np.asarray(out.pool_ids))

    def test_build_identical_graph(self, eight_devices):
        from scalablevectorsearch_tpu.index.vamana import build as build_mod
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        x, data, graph, queries = self._index()
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        params = VamanaBuildParameters(
            graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)
        g_sh, e_sh = sharded.sharded_build_graph(mesh, data, params, "l2",
                                                 batch_size=256)
        g_one, e_one = build_mod.build_graph(data, params, "l2",
                                             batch_size=256)
        assert e_sh == e_one
        n = data.n
        np.testing.assert_array_equal(np.asarray(g_sh.adjacency)[:n],
                                      np.asarray(g_one.adjacency)[:n])
        np.testing.assert_array_equal(np.asarray(g_sh.degrees)[:n],
                                      np.asarray(g_one.degrees)[:n])

    def test_build_knobs_identical_graph(self, eight_devices):
        """The single-chip builder's perf levers (first_pass_window,
        tail_frac, prune_pool — VERDICT r3 ask 7) plumb through the sharded
        builder and still produce the single-chip graph bit-for-bit."""
        from scalablevectorsearch_tpu.index.vamana import build as build_mod
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        x, data, graph, queries = self._index()
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        params = VamanaBuildParameters(
            graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)
        knobs = dict(batch_size=256, first_pass_window=12, tail_frac=4,
                     prune_pool=32)
        g_sh, e_sh = sharded.sharded_build_graph(mesh, data, params, "l2",
                                                 **knobs)
        g_one, e_one = build_mod.build_graph(data, params, "l2", **knobs)
        assert e_sh == e_one
        n = data.n
        np.testing.assert_array_equal(np.asarray(g_sh.adjacency)[:n],
                                      np.asarray(g_one.adjacency)[:n])
        np.testing.assert_array_equal(np.asarray(g_sh.degrees)[:n],
                                      np.asarray(g_one.degrees)[:n])

    def test_sampled_build_identical_graph(self, eight_devices):
        """Sampled-entries builds are deterministic too: the sharded build
        with sampled entries matches the single-device one bit-for-bit
        (same sample seed, same batch schedule, same prefix masking)."""
        from scalablevectorsearch_tpu.index.vamana import build as build_mod
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        x, data, graph, queries = self._index()
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        params = VamanaBuildParameters(
            graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)
        g_sh, e_sh = sharded.sharded_build_graph(
            mesh, data, params, "l2", batch_size=256, sampled_entries=True)
        g_one, e_one = build_mod.build_graph(
            data, params, "l2", batch_size=256, sampled_entries=True)
        assert e_sh == e_one
        n = data.n
        np.testing.assert_array_equal(np.asarray(g_sh.adjacency)[:n],
                                      np.asarray(g_one.adjacency)[:n])


class TestShardAtLoad:
    """Streamed shard-at-load (VERDICT r3 ask 8): read a vecs file in row
    blocks straight onto the mesh, never materializing the whole array on
    the host — must be bit-identical to the host-staged path."""

    def test_streamed_matches_host_staged(self, eight_devices, tmp_path):
        from scalablevectorsearch_tpu.core import io as core_io
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1003, 20)).astype(np.float32)
        path = str(tmp_path / "x.fvecs")
        core_io.write_vecs(path, x)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        # block_rows=37: many ragged blocks per shard, non-dividing bounds
        streamed = sharded.shard_dataset_from_file(path, mesh,
                                                   block_rows=37)
        staged = sharded.shard_dataset(VectorDataset.from_array(x), mesh)
        assert streamed.n == staged.n and streamed.dim == staged.dim
        assert streamed.capacity == staged.capacity
        np.testing.assert_array_equal(np.asarray(streamed.vectors),
                                      np.asarray(staged.vectors))
        np.testing.assert_array_equal(np.asarray(streamed.norms_sq),
                                      np.asarray(staged.norms_sq))

    def test_streamed_build_matches_host_staged(self, eight_devices,
                                                tmp_path):
        from scalablevectorsearch_tpu.core import io as core_io
        from scalablevectorsearch_tpu.index.vamana import build as build_mod
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        data, _ = svt.generate_test_dataset(1200, 8, 24, seed=21)
        path = str(tmp_path / "d.fvecs")
        core_io.write_vecs(path, data)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        params = VamanaBuildParameters(
            graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)
        g_sh, e_sh = sharded.sharded_build_graph(mesh, path, params, "l2",
                                                 batch_size=256)
        g_one, e_one = build_mod.build_graph(
            VectorDataset.from_array(data), params, "l2", batch_size=256)
        assert e_sh == e_one
        n = data.shape[0]
        np.testing.assert_array_equal(np.asarray(g_sh.adjacency)[:n],
                                      np.asarray(g_one.adjacency)[:n])

    def test_ranged_reads_match_full_read(self, tmp_path):
        from scalablevectorsearch_tpu.core import io as core_io
        rng = np.random.default_rng(4)
        x = (rng.normal(size=(101, 7)) * 10).astype(np.float32)
        path = str(tmp_path / "r.fvecs")
        core_io.write_vecs(path, x)
        assert core_io.probe_vecs_shape(path) == (101, 7)
        np.testing.assert_array_equal(
            core_io.read_vecs_rows(path, 40, 30), x[40:70])
        np.testing.assert_array_equal(
            core_io.read_vecs_rows(path, 90, 50), x[90:])   # clipped
        assert core_io.read_vecs_rows(path, 101, 5).shape == (0, 7)


class TestShardedCompressed:
    """Compressed shard views (VERDICT r2 ask 4): LVQ / SQ codes sharded by
    row block, decode local, (B, K) key panels pmin-merged — traversal must
    be bit-identical to the single-chip compressed datasets."""

    def _graph_queries(self, n, d, r, seed=7):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d)).astype(np.float32)
        adj = rng.integers(0, n, size=(n, r)).astype(np.int32)
        queries = rng.normal(size=(16, d)).astype(np.float32)
        return x, adj, queries

    @pytest.mark.parametrize("bits,residual", [(8, 0), (4, 8)])
    def test_lvq_search_bit_identical(self, eight_devices, bits, residual):
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        x, adj, queries = self._graph_queries(1200, 24, 10)
        lvq = LVQDataset.compress(x, bits=bits, residual_bits=residual)
        graph = NeighborGraph.from_array(
            np.pad(adj, ((0, lvq.capacity - adj.shape[0]), (0, 0)),
                   constant_values=-1))
        q = jnp.asarray(pad_matrix(queries, d_pad=lvq.padded_dim))
        eids = jnp.asarray([0], jnp.int32)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        kw = dict(window=12, capacity=12, max_iters=32, distance="l2")
        ref = greedy_search(graph, lvq, q, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, graph, lvq, q, eids, **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out.ids))
        fin = np.isfinite(np.asarray(ref.keys))
        np.testing.assert_allclose(np.where(fin, np.asarray(out.keys), 0),
                                   np.where(fin, np.asarray(ref.keys), 0),
                                   rtol=1e-6)

    def test_lvq_shard_view_get_matches(self, eight_devices):
        """get / get_full / norms_of through the collective view equal the
        single-chip decode exactly."""
        from jax.sharding import PartitionSpec as P
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        x, _, _ = self._graph_queries(600, 20, 8)
        lvq = LVQDataset.compress(x, bits=8, residual_bits=8)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        arrays, specs, meta = sharded.shard_lvq(lvq, mesh)
        ids = jnp.asarray([0, 5, 599, 300], jnp.int32)

        def local(*blocks):
            v = sharded.ShardedLVQShard(*blocks, **meta)
            return v.get(ids), v.get_full(ids), v.norms_of(ids)

        got, got_full, norms = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=specs,
            out_specs=(P(), P(), P()), check_vma=False))(*arrays)
        # rtol+atol: XLA may fuse the decode FMA differently inside
        # shard_map (observed 1-ulp differences on ~1e-3 magnitudes)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(lvq.get(ids)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_full),
                                   np.asarray(lvq.get_full(ids)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(norms),
                                   np.asarray(lvq.norms_of(ids)), rtol=1e-5)

    def test_sq_search_bit_identical(self, eight_devices):
        from scalablevectorsearch_tpu.quantization.scalar import SQDataset
        x, adj, queries = self._graph_queries(1000, 24, 10, seed=9)
        sq = SQDataset.compress(x)
        graph = NeighborGraph.from_array(
            np.pad(adj, ((0, sq.capacity - adj.shape[0]), (0, 0)),
                   constant_values=-1))
        q = jnp.asarray(pad_matrix(queries, d_pad=sq.padded_dim))
        eids = jnp.asarray([0], jnp.int32)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        kw = dict(window=12, capacity=12, max_iters=32, distance="l2")
        ref = greedy_search(graph, sq, q, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, graph, sq, q, eids, **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out.ids))


class TestShardedDynamic:
    """Sharded mutable Vamana (VERDICT r2 ask 4): the full
    add/delete/consolidate/compact lifecycle over shard views, with
    mutation parity against the single-chip index."""

    def _params(self):
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        return VamanaBuildParameters(
            alpha=1.1, graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)

    def test_mutation_parity_with_single_chip(self, eight_devices):
        """Re-shard a single-chip index, apply identical mutations to both,
        and require identical search results and adjacency."""
        from scalablevectorsearch_tpu.index.vamana.dynamic import (
            MutableVamanaIndex)
        from scalablevectorsearch_tpu.parallel.dynamic import (
            ShardedMutableVamanaIndex)
        data, queries = svt.generate_test_dataset(800, 24, 24, seed=13)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        ext = np.arange(700, dtype=np.int64)
        sc = MutableVamanaIndex(self._params(), data[:700], ext, "l2")
        sh = ShardedMutableVamanaIndex.from_single_chip(sc, mesh)

        r_sc = sc.search(queries, 5)
        r_sh = sh.search(queries, 5)
        np.testing.assert_array_equal(r_sc.ids, r_sh.ids)

        sc.add_points(data[700:800], np.arange(900, 1000))
        sh.add_points(data[700:800], np.arange(900, 1000))
        np.testing.assert_array_equal(
            np.asarray(sc.graph.adjacency)[:800],
            np.asarray(sh.adjacency)[:800])

        sc.delete_points(np.arange(10, 60))
        sh.delete_points(np.arange(10, 60))
        sc.consolidate()
        sh.consolidate()
        np.testing.assert_array_equal(
            np.asarray(sc.graph.adjacency)[:800],
            np.asarray(sh.adjacency)[:800])
        r_sc = sc.search(queries, 5)
        r_sh = sh.search(queries, 5)
        np.testing.assert_array_equal(r_sc.ids, r_sh.ids)

        # compact: slot layouts legitimately differ (global dense prefix vs
        # shard-local prefixes) but both must relabel the SAME graph and
        # recompute the medioid over the SAME alive set — external-id
        # search results stay identical
        sc.compact()
        sh.compact()
        assert sc.size == sh.size
        np.testing.assert_array_equal(sc.all_ids(), sh.all_ids())
        assert (sc.translator.to_external(np.asarray([sc.entry_point]))[0]
                == sh.translator.to_external(
                    np.asarray([sh.entry_point]))[0])
        r_sc = sc.search(queries, 5)
        r_sh = sh.search(queries, 5)
        np.testing.assert_array_equal(r_sc.ids, r_sh.ids)

    def test_lifecycle_from_scratch(self, eight_devices):
        """Native sharded build + full mutation cycle, recall-gated."""
        from scalablevectorsearch_tpu.parallel.dynamic import (
            ShardedMutableVamanaIndex)
        data, queries = svt.generate_test_dataset(900, 24, 24, seed=17)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        idx = ShardedMutableVamanaIndex(
            self._params(), data[:800], np.arange(800), "l2", mesh)
        gt = svt.exhaustive_search(data[:800], queries, 5)
        rec = svt.k_recall_at_n(gt, idx.search(queries, 5))
        assert rec >= 0.85, rec

        idx.add_points(data[800:900], np.arange(2000, 2100))
        idx.delete_points(np.arange(0, 100))
        idx.consolidate()
        idx.compact()
        assert idx.size == 800
        # post-compact: all surviving ids still resolve and search works
        live_ext = np.concatenate([np.arange(100, 800),
                                   np.arange(2000, 2100)])
        np.testing.assert_array_equal(idx.all_ids(), np.sort(live_ext))
        live_rows = np.concatenate([data[100:800], data[800:900]])
        gt2 = svt.exhaustive_search(live_rows, queries, 5)
        gt2_ext = live_ext[gt2.ids]
        res = idx.search(queries, 5)
        overlap = np.mean([len(set(a) & set(b)) / 5
                           for a, b in zip(gt2_ext, res.ids)])
        assert overlap >= 0.80, overlap

    def test_entry_sampler_tracks_mutations(self, eight_devices):
        """Sharded dynamic sampler: replicated sample of live slots,
        invalidated by every mutation, never yields deleted ids."""
        from scalablevectorsearch_tpu.parallel.dynamic import (
            ShardedMutableVamanaIndex)
        data, queries = svt.generate_test_dataset(900, 24, 24, seed=17)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        idx = ShardedMutableVamanaIndex(
            self._params(), data[:800], np.arange(800), "l2", mesh)
        gt = svt.exhaustive_search(data[:800], queries, 5)
        base = svt.k_recall_at_n(gt, idx.search(queries, 5))
        idx.enable_entry_sampler(n_samples=128, seed=0)
        rec = svt.k_recall_at_n(gt, idx.search(queries, 5))
        assert idx._entry_sampler is not None
        assert rec >= base - 0.05, (rec, base)
        sampled = np.asarray(idx._entry_sampler.ids)
        assert (idx.status[sampled] == 1).all()   # live slots only

        idx.add_points(data[800:900], np.arange(2000, 2100))
        assert idx._entry_sampler is None          # invalidated
        idx.delete_points(np.arange(0, 100))
        res = idx.search(queries, 5)
        assert idx._entry_sampler is not None      # lazily rebuilt
        assert not np.isin(res.ids, np.arange(0, 100)).any()
        idx.consolidate()
        assert idx._entry_sampler is None
        idx.compact()
        res2 = idx.search(queries, 5)
        assert (res2.ids >= 0).all()
        sampled = np.asarray(idx._entry_sampler.ids)
        assert (idx.status[sampled] == 1).all()
        idx.disable_entry_sampler()
        assert idx._entry_sampler is None

    def test_roundtrip_to_single_chip(self, eight_devices):
        from scalablevectorsearch_tpu.parallel.dynamic import (
            ShardedMutableVamanaIndex)
        data, queries = svt.generate_test_dataset(400, 16, 16, seed=23)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        idx = ShardedMutableVamanaIndex(
            self._params(), data, np.arange(400), "l2", mesh)
        single = idx.to_single_chip()
        r_sh = idx.search(queries, 5)
        r_sc = single.search(queries, 5)
        np.testing.assert_array_equal(r_sh.ids, r_sc.ids)


class TestShardedMidScale:
    """Mid-scale ragged-shard coverage (round-4 VERDICT next-6):
    collective-shape and padding bugs characteristically appear when shards
    are large and ragged — every older multi-device test used n <= 3k.

    Sizes here are the largest that fit the suite budget on the 8-virtual-
    device single-core CPU mesh: the ragged build-parity test costs ~5 min
    there and the cost is COMPILE-dominated (12k and 20k builds measured
    within seconds of each other; a 100k one > 25 min), so it runs at 20k.
    The asserted properties (bit-identical sharded build adjacency,
    bit-identical sharded serving, growth across a capacity boundary) are
    size-independent.  Set SVT_MIDSCALE_FULL=1 to run the 100k variant
    standalone:  SVT_MIDSCALE_FULL=1 pytest tests/test_parallel.py -k full
    (recorded green in COVERAGE.md round 5)."""

    N_RAGGED = 20_005        # not divisible by 8 shards x 8-row blocks

    def _build_parity(self, n):
        from scalablevectorsearch_tpu.index.vamana import build as build_mod
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        from scalablevectorsearch_tpu.index.vamana.search import (
            default_max_iters, greedy_search)
        data, queries = svt.generate_test_dataset(n, 100, 16, seed=29)
        ds = VectorDataset.from_array(data)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        params = VamanaBuildParameters(
            alpha=1.1, graph_max_degree=8, window_size=12,
            max_candidate_pool_size=24, prune_to=7)
        g_sh, e_sh = sharded.sharded_build_graph(mesh, ds, params, "l2",
                                                 batch_size=8192)
        g_one, e_one = build_mod.build_graph(ds, params, "l2",
                                             batch_size=8192)
        assert e_sh == e_one
        np.testing.assert_array_equal(np.asarray(g_sh.adjacency)[:n],
                                      np.asarray(g_one.adjacency)[:n])
        np.testing.assert_array_equal(np.asarray(g_sh.degrees)[:n],
                                      np.asarray(g_one.degrees)[:n])
        # sharded serving must be bit-identical to single-chip on the
        # mid-scale ragged graph (absolute recall is a graph-quality
        # property gated by the goldens/bench, not a sharding property —
        # this deliberately low-degree graph disconnects on clustered data)
        q = jnp.asarray(pad_matrix(queries))
        eids = jnp.asarray([e_one], jnp.int32)
        kw = dict(window=24, capacity=24, max_iters=default_max_iters(24),
                  distance="l2")
        ref = greedy_search(g_one, ds, q, eids, **kw)
        out = sharded.sharded_greedy_search(mesh, g_sh, ds, q, eids, **kw)
        np.testing.assert_array_equal(np.asarray(ref.ids),
                                      np.asarray(out.ids))

    def test_build_and_serving_parity_ragged(self, eight_devices):
        self._build_parity(self.N_RAGGED)

    @pytest.mark.skipif(os.environ.get("SVT_MIDSCALE_FULL") != "1",
                        reason="~30 min on the CPU mesh; set "
                               "SVT_MIDSCALE_FULL=1 to run")
    def test_build_and_serving_parity_100k_full(self, eight_devices):
        self._build_parity(100_003)

    def test_dynamic_growth_across_capacity_boundary(self, eight_devices):
        """Sharded add/delete/compact cycle whose adds cross the blocked
        capacity boundary (growth re-lays out BOTH sharded structures;
        round-4 VERDICT next-6 asked for exactly this at ragged sizes)."""
        from scalablevectorsearch_tpu.index.vamana.dynamic import (
            MutableVamanaIndex)
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        from scalablevectorsearch_tpu.parallel.dynamic import (
            ShardedMutableVamanaIndex)
        n0, n_add = 4_003, 1_200           # ragged start, growth-crossing add
        data, queries = svt.generate_test_dataset(n0 + n_add, 32, 24,
                                                  seed=31)
        params = VamanaBuildParameters(
            alpha=1.1, graph_max_degree=12, window_size=24,
            max_candidate_pool_size=48, prune_to=10)
        mesh = mesh_mod.make_mesh(8, axis_name="shard")
        ext = np.arange(n0, dtype=np.int64)
        sc = MutableVamanaIndex(params, data[:n0], ext, "l2",
                                capacity=n0)
        sh = ShardedMutableVamanaIndex.from_single_chip(sc, mesh)
        cap0 = sh.capacity
        assert n0 + n_add > cap0, "fixture must cross the capacity boundary"

        new_ids = np.arange(10_000, 10_000 + n_add, dtype=np.int64)
        sc.add_points(data[n0:], new_ids)
        sh.add_points(data[n0:], new_ids)
        assert sh.capacity > cap0
        r_sc = sc.search(queries, 5)
        r_sh = sh.search(queries, 5)
        np.testing.assert_array_equal(r_sc.ids, r_sh.ids)

        # delete a stripe spanning shard boundaries, consolidate, compact
        sc.delete_points(np.arange(100, 700))
        sh.delete_points(np.arange(100, 700))
        sc.consolidate()
        sh.consolidate()
        sc.compact()
        sh.compact()
        assert sc.size == sh.size == n0 + n_add - 600
        np.testing.assert_array_equal(sc.all_ids(), sh.all_ids())
        r_sc = sc.search(queries, 5)
        r_sh = sh.search(queries, 5)
        np.testing.assert_array_equal(r_sc.ids, r_sh.ids)
