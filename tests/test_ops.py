"""Kernel-level tests: distance matrices and top-k vs float64 NumPy references
— the TPU analog of the reference's SIMD-vs-scalar-reference tests
(tests/svs/core/distances/distance_euclidean.cpp style)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scalablevectorsearch_tpu.lib import datatypes as dt
from scalablevectorsearch_tpu.ops import distance as dist_ops
from scalablevectorsearch_tpu.ops import topk as topk_ops

D = dist_ops.DistanceType


def np_keys(distance, q, x):
    q = q.astype(np.float64)
    x = x.astype(np.float64)
    dots = q @ x.T
    if distance == D.MIP:
        return -dots
    if distance == D.L2:
        return ((q ** 2).sum(1)[:, None] - 2 * dots + (x ** 2).sum(1)[None, :])
    qn = np.sqrt((q ** 2).sum(1))[:, None]
    xn = np.sqrt((x ** 2).sum(1))[None, :]
    return -dots / (qn * xn)


class TestPairwiseKeys:
    @pytest.mark.parametrize("distance", [D.L2, D.MIP, D.Cosine])
    @pytest.mark.parametrize("dim", [4, 100, 128])
    def test_vs_numpy(self, rng, distance, dim):
        q = rng.normal(size=(7, dim)).astype(np.float32)
        x = rng.normal(size=(33, dim)).astype(np.float32)
        got = np.asarray(dist_ops.pairwise_keys(distance, jnp.asarray(q),
                                                jnp.asarray(x)))
        want = np_keys(distance, q, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_padding_preserves_l2_and_ip(self, rng):
        """Zero-padding the feature dim must not change distances."""
        q = rng.normal(size=(5, 60)).astype(np.float32)
        x = rng.normal(size=(20, 60)).astype(np.float32)
        qp, xp = dt.pad_matrix(q), dt.pad_matrix(x)
        for distance in [D.L2, D.MIP, D.Cosine]:
            a = np.asarray(dist_ops.pairwise_keys(
                distance, jnp.asarray(q), jnp.asarray(x)))
            b = np.asarray(dist_ops.pairwise_keys(
                distance, jnp.asarray(qp), jnp.asarray(xp)))[:5, :20]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_inf_norms_mask(self, rng):
        q = rng.normal(size=(3, 8)).astype(np.float32)
        x = rng.normal(size=(4, 8)).astype(np.float32)
        norms = (x.astype(np.float64) ** 2).sum(1).astype(np.float32)
        norms[2] = np.inf
        keys = np.asarray(dist_ops.pairwise_keys(
            D.L2, jnp.asarray(q), jnp.asarray(x),
            vector_norms_sq=jnp.asarray(norms)))
        assert np.all(np.isinf(keys[:, 2]))
        assert np.all(np.isfinite(keys[:, [0, 1, 3]]))

    @pytest.mark.parametrize("distance", [D.L2, D.MIP, D.Cosine])
    def test_gathered_matches_pairwise(self, rng, distance):
        q = rng.normal(size=(6, 32)).astype(np.float32)
        x = rng.normal(size=(50, 32)).astype(np.float32)
        ids = rng.integers(0, 50, size=(6, 9))
        gathered = jnp.asarray(x[ids])
        got = np.asarray(dist_ops.gathered_keys(distance, jnp.asarray(q),
                                                gathered))
        want = np_keys(distance, q, x)[np.arange(6)[:, None], ids]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_value_key_roundtrip(self):
        keys = jnp.array([[1.0, -2.0]])
        for distance in [D.L2, D.MIP, D.Cosine]:
            vals = dist_ops.value_from_key(distance, keys)
            back = dist_ops.key_from_value(distance, vals)
            np.testing.assert_allclose(np.asarray(back), np.asarray(keys))

    def test_bf16_path(self, rng):
        q = rng.normal(size=(4, 64)).astype(np.float32)
        x = rng.normal(size=(16, 64)).astype(np.float32)
        got = np.asarray(dist_ops.pairwise_keys(
            D.L2, jnp.asarray(q).astype(jnp.bfloat16),
            jnp.asarray(x).astype(jnp.bfloat16)))
        want = np_keys(D.L2, q, x)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


class TestTopK:
    def test_smallest_k(self, rng):
        keys = rng.normal(size=(5, 40)).astype(np.float32)
        got_k, got_i = topk_ops.smallest_k(jnp.asarray(keys), None, 10)
        order = np.argsort(keys, axis=1)[:, :10]
        np.testing.assert_allclose(
            np.asarray(got_k), np.take_along_axis(keys, order, 1), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_i), order)

    def test_invalid_marking(self):
        keys = jnp.array([[1.0, jnp.inf, 0.5]])
        got_k, got_i = topk_ops.smallest_k(keys, None, 3)
        assert np.asarray(got_i)[0, 2] == topk_ops.INVALID_ID

    def test_merge(self, rng):
        a = rng.normal(size=(3, 8)).astype(np.float32)
        b = rng.normal(size=(3, 8)).astype(np.float32)
        ka, ia = topk_ops.smallest_k(jnp.asarray(a), None, 8)
        kb, ib = topk_ops.smallest_k(jnp.asarray(b), None, 8)
        mk, mi = topk_ops.merge_smallest(ka, ia, kb, ib + 100, 5)
        want = np.sort(np.concatenate([a, b], axis=1), axis=1)[:, :5]
        np.testing.assert_allclose(np.asarray(mk), want, rtol=1e-6)

    def test_mask_duplicates(self):
        keys = jnp.ones((2, 3), jnp.float32)
        ids = jnp.array([[1, 2, 3], [4, 5, 6]], dtype=jnp.int32)
        against = jnp.array([[2, 9], [9, 9]], dtype=jnp.int32)
        out = np.asarray(topk_ops.mask_duplicate_ids(keys, ids, against))
        assert np.isinf(out[0, 1])
        assert np.isfinite(out).sum() == 5

    def test_mask_first_duplicates(self):
        keys = jnp.ones((1, 4), jnp.float32)
        ids = jnp.array([[7, 7, 8, 7]], dtype=jnp.int32)
        out = np.asarray(topk_ops.mask_first_duplicates(keys, ids))
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 2])
        assert np.isinf(out[0, 1]) and np.isinf(out[0, 3])
