"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scalablevectorsearch_tpu.ops.pallas.gather_distance import (
    gather_score_l2_partial)


class TestGatherScore:
    @pytest.mark.parametrize("b,k,d", [(8, 16, 128), (16, 32, 256)])
    def test_matches_reference(self, rng, b, k, d):
        n = 500
        x = rng.normal(size=(n, d)).astype(np.float32)
        ids = rng.integers(0, n, size=(b, k)).astype(np.int32)
        q = rng.normal(size=(b, d)).astype(np.float32)
        out = gather_score_l2_partial(jnp.asarray(x), jnp.asarray(ids),
                                      jnp.asarray(q), tile_b=8,
                                      interpret=True)
        rows = x[ids]
        want = (rows.astype(np.float64) ** 2).sum(-1) - \
            2 * np.einsum("bd,bkd->bk", q.astype(np.float64),
                          rows.astype(np.float64))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4,
                                   atol=1e-3)

    def test_full_l2_key_recovery(self, rng):
        """partial + ||q||^2 reproduces squared L2 distances."""
        n, d, b, k = 200, 128, 8, 8
        x = rng.normal(size=(n, d)).astype(np.float32)
        ids = rng.integers(0, n, size=(b, k)).astype(np.int32)
        q = rng.normal(size=(b, d)).astype(np.float32)
        partial = np.asarray(gather_score_l2_partial(
            jnp.asarray(x), jnp.asarray(ids), jnp.asarray(q), tile_b=8,
            interpret=True))
        keys = partial + (q ** 2).sum(-1)[:, None]
        want = ((q[:, None, :] - x[ids]) ** 2).sum(-1)
        np.testing.assert_allclose(keys, want, rtol=1e-3, atol=1e-3)
