"""Multi-chip example: dataset-sharded search over a device mesh.

Runs on 8 virtual CPU devices so it works anywhere:
    python examples/example_multichip.py
On a real TPU slice, drop the platform override.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import scalablevectorsearch_tpu as svt
from scalablevectorsearch_tpu.lib.datatypes import pad_matrix
from scalablevectorsearch_tpu.parallel import mesh as mesh_mod
from scalablevectorsearch_tpu.parallel import sharded


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} ({jax.default_backend()})")
    data, queries = svt.generate_test_dataset(20_000, 100, 64, seed=3)
    gt = svt.exhaustive_search(data, queries, 10)
    q = jnp.asarray(pad_matrix(queries))

    # --- flat search with dataset rows sharded across the mesh -------------
    mesh = mesh_mod.make_mesh(n_dev, axis_name="shard")
    ds = sharded.shard_dataset(svt.VectorDataset.from_array(data), mesh)
    keys, ids = sharded.sharded_flat_search(mesh, ds, q, 10, svt.L2)
    recall = svt.k_recall_at_n(gt.ids, np.asarray(ids)[: len(queries)])
    print(f"sharded flat recall@10: {recall:.4f}")

    # --- IVF with posting lists sharded by cluster --------------------------
    from scalablevectorsearch_tpu.index.ivf.index import IVFIndex
    params = svt.IVFBuildParameters(num_centroids=64, num_iterations=5,
                                    training_fraction=0.5)
    ivf = IVFIndex.build(params, data, svt.L2)
    keys, ids = sharded.sharded_ivf_search(mesh, ivf, q, 10, n_probes=16)
    recall = svt.k_recall_at_n(gt.ids, np.asarray(ids)[: len(queries)])
    print(f"sharded IVF recall@10 (16 probes): {recall:.4f}")

    # --- query-parallel Vamana (index replicated, queries sharded) ---------
    mesh_dp = mesh_mod.make_mesh(n_dev, axis_name="dp")
    vparams = svt.VamanaBuildParameters(graph_max_degree=24, window_size=48)
    v = svt.VamanaIndex.build(vparams, data, svt.L2)
    out = sharded.dp_greedy_search(
        mesh_dp, v.graph, v.data, q,
        jnp.asarray([v.entry_point], jnp.int32),
        window=40, capacity=40, max_iters=100, distance=svt.L2)
    recall = svt.k_recall_at_n(gt.ids,
                               np.asarray(out.ids)[: len(queries), :10])
    print(f"query-parallel vamana recall@10: {recall:.4f}")

    # --- sharded-graph Vamana over LVQ codes (memory-scaling config) -------
    # graph rows AND compressed codes sharded across the mesh; decode is
    # local, only (B, K) key panels cross the interconnect
    from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
    lvq = LVQDataset.compress(data, bits=8)
    out = sharded.sharded_greedy_search(
        mesh, v.graph, lvq, q, jnp.asarray([v.entry_point], jnp.int32),
        window=40, capacity=40, max_iters=100, distance=svt.L2)
    recall = svt.k_recall_at_n(gt.ids,
                               np.asarray(out.ids)[: len(queries), :10])
    print(f"sharded-graph vamana over sharded LVQ8 recall@10: {recall:.4f}")

    # --- sharded DYNAMIC Vamana: mutations over shard views ----------------
    from scalablevectorsearch_tpu.parallel.dynamic import (
        ShardedMutableVamanaIndex)
    m = 4_000
    dyn = ShardedMutableVamanaIndex(
        vparams, data[:m], np.arange(m), svt.L2, mesh)
    dyn.add_points(data[m:m + 500], np.arange(100_000, 100_500))
    dyn.delete_points(np.arange(0, 250))
    dyn.consolidate()
    dyn.compact()
    res = dyn.search(queries, 10)
    live = np.concatenate([data[250:m], data[m:m + 500]])
    live_ext = np.concatenate([np.arange(250, m),
                               np.arange(100_000, 100_500)])
    gt_live = svt.exhaustive_search(live, queries, 10)
    hits = np.mean([len(set(live_ext[g]) & set(r)) / 10
                    for g, r in zip(gt_live.ids, res.ids)])
    print(f"sharded dynamic vamana (after add/delete/consolidate/compact) "
          f"recall@10: {hits:.4f}")


if __name__ == "__main__":
    main()
