"""Multi-device sharding tests on the 8-virtual-CPU-device mesh — the analog
of the reference's threadpool/NUMA coverage, exercised the way the driver's
dryrun does (SURVEY §4 TPU translation note)."""

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
    def test_matches_single_device(self, eight_devices):
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
