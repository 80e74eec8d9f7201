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


class TestBeamUpdate:
    """Fused beam-update kernel vs a per-row python emulation of the
    reference inner loop (greedy_search.h:124-203 post-distance steps)."""

    @staticmethod
    def _emulate(bkeys, bpacked, ckeys, cids, window, m):
        from scalablevectorsearch_tpu.ops.pallas.beam_update import (
            ID_MASK, VIS_BIT)
        B, C = bkeys.shape
        K = ckeys.shape[1]
        out_keys = np.empty_like(bkeys)
        out_packed = np.empty_like(bpacked)
        popped = np.full((B, m), -1, np.int32)
        surv = [set() for _ in range(B)]
        for r in range(B):
            entries, seen = [], set()
            for j in range(C):
                if np.isfinite(bkeys[r, j]):
                    entries.append((bkeys[r, j], int(bpacked[r, j])))
                    seen.add(int(bpacked[r, j]) & ID_MASK)
            for j in range(K):
                cid = int(cids[r, j])
                if cid < 0 or not np.isfinite(ckeys[r, j]) or cid in seen:
                    continue
                seen.add(cid)
                surv[r].add((float(ckeys[r, j]), cid))
                entries.append((ckeys[r, j], cid))
            entries.sort(key=lambda t: t[0])
            entries = entries[:C]
            keys = [e[0] for e in entries] + [np.inf] * (C - len(entries))
            packed = [e[1] for e in entries] + [0] * (C - len(entries))
            cnt = 0
            for j in range(min(window, len(entries))):
                if cnt == m:
                    break
                if (packed[j] >> 30) == 0:
                    popped[r, cnt] = packed[j] & ID_MASK
                    packed[j] |= VIS_BIT
                    cnt += 1
            out_keys[r], out_packed[r] = keys, packed
        return out_keys, out_packed, popped, surv

    def _random_case(self, rng, B=16, C=48, K=64, n_ids=200):
        bids = np.stack([rng.choice(n_ids, C, replace=False)
                         for _ in range(B)]).astype(np.int32)
        bkeys = np.sort(rng.normal(size=(B, C)).astype(np.float32), axis=1)
        nvalid = rng.integers(1, C + 1, size=B)
        for r in range(B):
            bkeys[r, nvalid[r]:] = np.inf
        vis = (rng.random((B, C)) < 0.5).astype(np.int32)
        bpacked = (bids + (vis << 30)).astype(np.int32)
        cids = rng.integers(-1, n_ids, size=(B, K)).astype(np.int32)
        # keys are a function of (query, id): duplicate ids carry equal keys
        table = rng.normal(size=(B, n_ids)).astype(np.float32)
        ckeys = np.take_along_axis(table, np.maximum(cids, 0), axis=1)
        ckeys[cids < 0] = np.inf
        return bkeys, bpacked, ckeys, cids

    @pytest.mark.parametrize("interpret_kernel", [False, True])
    def test_matches_emulation(self, rng, interpret_kernel):
        from scalablevectorsearch_tpu.ops.pallas.beam_update import (
            beam_update, beam_update_reference)
        window, m = 32, 4
        bkeys, bpacked, ckeys, cids = self._random_case(rng)
        fn = beam_update if interpret_kernel else beam_update_reference
        kwargs = {"interpret": True} if interpret_kernel else {}
        rk, rp, rpop, sk, si = fn(
            jnp.asarray(bkeys), jnp.asarray(bpacked), jnp.asarray(ckeys),
            jnp.asarray(cids), window=window, m=m, **kwargs)
        ek, ep, epop, esurv = self._emulate(bkeys, bpacked, ckeys, cids,
                                            window, m)
        rk, rp, rpop = np.asarray(rk), np.asarray(rp), np.asarray(rpop)
        finite = np.isfinite(ek)
        np.testing.assert_array_equal(np.where(finite, rk, 0),
                                      np.where(finite, ek, 0))
        np.testing.assert_array_equal(np.where(finite, rp, 0),
                                      np.where(finite, ep, 0))
        np.testing.assert_array_equal(rpop, epop)
        sk, si = np.asarray(sk), np.asarray(si)
        for r in range(len(sk)):
            got = {(float(sk[r, j]), int(si[r, j]))
                   for j in range(sk.shape[1]) if np.isfinite(sk[r, j])}
            assert got == esurv[r]

    def test_bitonic_sort(self, rng):
        from scalablevectorsearch_tpu.ops.pallas.beam_update import (
            bitonic_sort)
        for n in (8, 64, 256):
            keys = rng.normal(size=(16, n)).astype(np.float32)
            keys[rng.random(keys.shape) < 0.2] = np.inf
            payload = rng.integers(0, 1000, size=(16, n)).astype(np.int32)
            sk, sp = bitonic_sort(jnp.asarray(keys), jnp.asarray(payload))
            sk, sp = np.asarray(sk), np.asarray(sp)
            np.testing.assert_array_equal(
                sk, np.sort(keys, axis=1))
            for r in range(16):
                assert (sorted(zip(sk[r].tolist(), sp[r].tolist()))
                        == sorted(zip(keys[r].tolist(), payload[r].tolist())))
