"""RobustPrune kernel tests vs a sequential NumPy reference implementing the
exact semantics of the reference's heuristic_prune_neighbors
(include/svs/index/vamana/prune.h progressive + iterative strategies)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scalablevectorsearch_tpu.ops.prune import robust_prune
from scalablevectorsearch_tpu.ops.distance import DistanceType

D = DistanceType


def np_progressive_prune(pool_ids, pool_keys, vectors, alpha, max_result,
                         self_id):
    """Sequential progressive strategy (prune.h:183-239), L2 squared dists.

    NOTE: matches this framework's semantics — ratio updates accumulate even
    for currently-suppressed candidates (deliberate deviation from the
    reference's skip at prune.h:224; see ops/prune.py docstring)."""
    p = len(pool_ids)
    pruned = np.full(p, -np.inf)
    result = []
    levels = [1.0] if alpha == 1.0 else [1.0, alpha]
    for cur in levels:
        start = 0
        while len(result) < max_result and start < p:
            if (pruned[start] > cur or pool_ids[start] == self_id
                    or pool_ids[start] < 0):
                start += 1
                continue
            pruned[start] = np.inf
            result.append(pool_ids[start])
            q = vectors[pool_ids[start]]
            for t in range(start + 1, p):
                if pool_ids[t] < 0 or pruned[t] == np.inf:
                    continue
                djk = ((q - vectors[pool_ids[t]]) ** 2).sum()
                ratio = pool_keys[t] / djk if djk > 0 else np.inf
                pruned[t] = max(pruned[t], ratio)
            start += 1
    return result


def np_iterative_prune(pool_ids, pool_keys, vectors, alpha, max_result,
                       self_id, sim):
    """Sequential iterative strategy (prune.h:107-174), similarity space."""
    p = len(pool_ids)
    AVAIL, ADDED, PRUNED = 0, 1, 2
    state = np.full(p, AVAIL)
    result = []
    levels = [1.0] if alpha == 1.0 else [1.0, alpha]
    for cur in levels:
        start = 0
        while len(result) < max_result and start < p:
            if (state[start] != AVAIL or pool_ids[start] == self_id
                    or pool_ids[start] < 0):
                start += 1
                continue
            state[start] = ADDED
            result.append(pool_ids[start])
            q = vectors[pool_ids[start]]
            for t in range(start + 1, p):
                if state[t] != AVAIL or pool_ids[t] < 0:
                    continue
                djk = sim(q, vectors[pool_ids[t]])
                if cur * djk > -pool_keys[t]:  # keys are negated sims
                    state[t] = PRUNED
            start += 1
        state = np.where(state == PRUNED, AVAIL, state)
    return result


def make_pool(rng, n, p, dim, distance, self_id):
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    ids = rng.choice(n, size=p, replace=False).astype(np.int32)
    q = vectors[self_id].astype(np.float64)
    if distance == D.L2:
        keys = ((vectors[ids].astype(np.float64) - q) ** 2).sum(1)
    elif distance == D.MIP:
        keys = -(vectors[ids].astype(np.float64) @ q)
    else:
        keys = -(vectors[ids] @ q) / (
            np.linalg.norm(vectors[ids], axis=1) * np.linalg.norm(q))
    order = np.argsort(keys, kind="stable")
    return vectors, ids[order], keys[order].astype(np.float32)


def run_kernel(vectors, ids, keys, self_id, alpha, max_result, distance):
    pool_vecs = vectors[np.maximum(ids, 0)]
    norms = (pool_vecs.astype(np.float64) ** 2).sum(1).astype(np.float32)
    rows, degs = robust_prune(
        jnp.asarray(ids[None, :]), jnp.asarray(keys[None, :]),
        jnp.asarray(pool_vecs[None]), jnp.asarray(norms[None]),
        jnp.asarray([self_id], dtype=jnp.int32),
        alpha, max_result, distance)
    rows = np.asarray(rows[0])
    return rows[rows >= 0].tolist(), int(degs[0])


class TestRobustPrune:
    @pytest.mark.parametrize("alpha", [1.0, 1.2])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_progressive_matches_reference(self, seed, alpha):
        rng = np.random.default_rng(seed)
        vectors, ids, keys = make_pool(rng, 200, 40, 16, D.L2, self_id=5)
        want = np_progressive_prune(ids, keys, vectors, alpha, 8, 5)
        got, deg = run_kernel(vectors, ids, keys, 5, alpha, 8, D.L2)
        assert got == want
        assert deg == len(want)

    @pytest.mark.parametrize("distance", [D.MIP, D.Cosine])
    @pytest.mark.parametrize("alpha", [1.0, 0.95])
    @pytest.mark.parametrize("seed", [0, 3])
    def test_iterative_matches_reference(self, seed, alpha, distance):
        rng = np.random.default_rng(seed)
        vectors, ids, keys = make_pool(rng, 200, 40, 16, distance, self_id=7)
        if distance == D.MIP:
            sim = lambda a, b: float(a.astype(np.float64) @ b)
        else:
            sim = lambda a, b: float(
                (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        want = np_iterative_prune(ids, keys, vectors, alpha, 8, 7, sim)
        got, deg = run_kernel(vectors, ids, keys, 7, alpha, 8, distance)
        assert got == want

    def test_excludes_self_and_padding(self):
        rng = np.random.default_rng(0)
        vectors, ids, keys = make_pool(rng, 100, 20, 8, D.L2, self_id=3)
        # put self into the pool explicitly at the front
        ids = np.concatenate([[3], ids[:-1]]).astype(np.int32)
        keys = np.concatenate([[0.0], keys[:-1]]).astype(np.float32)
        ids[-3:] = -1
        keys[-3:] = np.inf
        got, deg = run_kernel(vectors, ids, keys, 3, 1.2, 10, D.L2)
        assert 3 not in got
        assert all(i >= 0 for i in got)

    def test_max_result_respected(self):
        rng = np.random.default_rng(1)
        vectors, ids, keys = make_pool(rng, 300, 60, 8, D.L2, self_id=0)
        got, deg = run_kernel(vectors, ids, keys, 0, 1.2, 4, D.L2)
        assert len(got) <= 4 and deg <= 4

    def test_first_selected_is_nearest(self):
        rng = np.random.default_rng(2)
        vectors, ids, keys = make_pool(rng, 100, 30, 8, D.L2, self_id=50)
        got, _ = run_kernel(vectors, ids, keys, 50, 1.2, 8, D.L2)
        valid = [i for i in ids if i != 50 and i >= 0]
        assert got[0] == valid[0]
