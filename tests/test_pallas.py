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

    def test_bitonic_merge(self, rng):
        from scalablevectorsearch_tpu.ops.pallas.beam_step import (
            bitonic_merge)
        for n in (8, 64, 256):
            a = np.sort(rng.normal(size=(4, n // 2)).astype(np.float32), 1)
            b = np.sort(rng.normal(size=(4, n // 2)).astype(np.float32),
                        1)[:, ::-1]
            keys = np.concatenate([a, b], axis=1)
            payload = np.arange(4 * n, dtype=np.int32).reshape(4, n)
            mk, mp = bitonic_merge(jnp.asarray(keys), jnp.asarray(payload))
            mk, mp = np.asarray(mk), np.asarray(mp)
            np.testing.assert_array_equal(mk, np.sort(keys, axis=1))
            for r in range(4):
                assert (sorted(zip(mk[r].tolist(), mp[r].tolist()))
                        == sorted(zip(keys[r].tolist(), payload[r].tolist())))

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


class TestBeamStep:
    """Fully-fused beam-step kernel (score + dedup + merge + pop) vs a
    brute-force model of one reference greedy-search iteration
    (greedy_search.h:124-203)."""

    @staticmethod
    def _brute(beam_keys, beam_packed, vecs, cand_ids, queries, metric,
               window, m):
        B, C = beam_keys.shape
        K = cand_ids.shape[1]
        out_keys = np.full((B, C), np.inf, np.float32)
        out_packed = np.full((B, C), -1, np.int64)
        popped = np.full((B, m), -1, np.int32)
        pools = [set() for _ in range(B)]
        for bi in range(B):
            q = queries[bi].astype(np.float64)
            entries = {}
            for ci in range(C):
                if np.isfinite(beam_keys[bi, ci]):
                    entries[int(beam_packed[bi, ci]) & ((1 << 30) - 1)] = (
                        float(beam_keys[bi, ci]),
                        (int(beam_packed[bi, ci]) >> 30) & 1)
            seen = set()
            for ki in range(K):
                cid = int(cand_ids[bi, ki])
                if cid < 0 or cid in seen:
                    continue
                seen.add(cid)
                x = vecs[bi, ki].astype(np.float64)
                dot = float(x @ q)
                if metric == 1:
                    key = -dot
                elif metric == 0:
                    key = max(float(q @ q) - 2 * dot + float(x @ x), 0.0)
                else:
                    key = -dot / (np.sqrt(max(q @ q, 1e-30))
                                  * np.sqrt(max(x @ x, 1e-30)))
                pools[bi].add(cid)  # pool keeps beam-resident dups too
                if cid not in entries:
                    entries[cid] = (key, 0)
            items = sorted(entries.items(), key=lambda kv: kv[1][0])[:C]
            pops = []
            for j, (cid, (key, vis)) in enumerate(items):
                if len(pops) < m and j < window and vis == 0:
                    vis = 1
                    pops.append(cid)
                out_keys[bi, j] = key
                out_packed[bi, j] = cid | (vis << 30)
            for j, pid in enumerate(pops):
                popped[bi, j] = pid
        return out_keys, out_packed, popped, pools

    def _case(self, rng, B, C, K, d, n_ids=400):
        beam_ids = np.stack([rng.choice(n_ids, C, replace=False)
                             for _ in range(B)]).astype(np.int32)
        beam_keys = np.sort(
            rng.normal(size=(B, C)).astype(np.float32) ** 2, axis=1)
        vis = (rng.random((B, C)) < 0.5).astype(np.int32)
        for bi in range(B):
            nv = rng.integers(0, C // 3 + 1)
            if nv:
                beam_keys[bi, C - nv:] = np.inf
        beam_packed = np.where(np.isfinite(beam_keys),
                               beam_ids | (vis << 30), -1).astype(np.int32)
        cand_ids = rng.choice(n_ids, (B, K)).astype(np.int32)
        cand_ids[rng.random((B, K)) < 0.2] = -1
        table = rng.normal(size=(n_ids, d)).astype(np.float32)
        vecs = table[np.maximum(cand_ids, 0)]
        queries = rng.normal(size=(B, d)).astype(np.float32)
        return beam_keys, beam_packed, vecs, cand_ids, queries

    @pytest.mark.parametrize("metric", [0, 1, 2])
    @pytest.mark.parametrize("shape", [(8, 16, 32, 128, 12, 2),
                                       (16, 48, 128, 128, 48, 4),
                                       (8, 24, 8, 64, 24, 4)])
    def test_matches_brute_force(self, rng, metric, shape):
        from scalablevectorsearch_tpu.ops.pallas.beam_step import (
            beam_step, beam_step_reference)
        B, C, K, d, window, m = shape
        bk, bp, vecs, cids, q = self._case(rng, B, C, K, d)
        args = (jnp.asarray(bk), jnp.asarray(bp), jnp.asarray(vecs),
                jnp.asarray(cids), jnp.asarray(q))
        ref = beam_step_reference(*args, metric=metric, window=window, m=m)
        ker = beam_step(*args, metric=metric, window=window, m=m,
                        interpret=True, block_rows=8)
        for name, r, kk in zip(("keys", "packed", "popped", "pool_keys",
                                "pool_ids"), ref, ker):
            np.testing.assert_allclose(np.asarray(r), np.asarray(kk),
                                       rtol=1e-5, atol=1e-5, err_msg=name)
        ek, ep, epop, epools = self._brute(bk, bp, vecs, cids, q, metric,
                                           window, m)
        rk, rp, rpop = (np.asarray(ref[0]), np.asarray(ref[1]),
                        np.asarray(ref[2]))
        fin = np.isfinite(ek)
        np.testing.assert_allclose(np.where(fin, rk, 0),
                                   np.where(fin, ek, 0), rtol=1e-4, atol=1e-4)
        assert np.all((rp & ((1 << 30) - 1))[fin] == (ep & ((1 << 30) - 1))[fin])
        assert np.all((rp >> 30)[fin] == (ep >> 30)[fin])
        np.testing.assert_array_equal(rpop, epop)
        pk, pi = np.asarray(ref[3]), np.asarray(ref[4])
        for bi in range(B):
            got = {int(pi[bi, j]) for j in range(pk.shape[1])
                   if np.isfinite(pk[bi, j])}
            assert got == epools[bi]

    @pytest.mark.parametrize("metric", [0, 1])
    def test_lvq_kernel_matches_decoded(self, rng, metric):
        """beam_step_lvq (fused in-kernel decode) == beam_step over the
        pre-decoded f32 rows, and == the XLA reference with the decode
        tuple (the dead-lane norm correction must be exact)."""
        from scalablevectorsearch_tpu.ops.pallas.beam_step import (
            beam_step, beam_step_lvq, beam_step_reference)
        B, C, K, dim, window, m = 8, 16, 32, 48, 12, 2
        d_pad = 128  # forces a live dead-lane correction (n_dead = 80)
        bk, bp, _vecs, cids, _q = self._case(rng, B, C, K, d_pad)
        n_ids = 400
        codes = rng.integers(-128, 128, size=(n_ids, d_pad)).astype(np.int8)
        codes[:, dim:] = 0
        scales = rng.uniform(0.01, 0.1, size=n_ids).astype(np.float32)
        biases = rng.normal(size=n_ids).astype(np.float32)
        mean = np.zeros(d_pad, np.float32)
        mean[:dim] = rng.normal(size=dim).astype(np.float32)
        q = rng.normal(size=(B, d_pad)).astype(np.float32)
        q[:, dim:] = 0.0

        cl = np.maximum(cids, 0)
        crows = codes[cl]
        sc, bi = scales[cl], biases[cl]
        # pre-decoded rows, live lanes only (what the XLA path scores)
        dec = (mean + bi[..., None] + sc[..., None]
               * crows.astype(np.float32))
        dec[..., dim:] = 0.0

        args = dict(metric=metric, window=window, m=m)
        plain = beam_step(jnp.asarray(bk), jnp.asarray(bp),
                          jnp.asarray(dec), jnp.asarray(cids),
                          jnp.asarray(q), interpret=True, block_rows=8,
                          **args)
        fused = beam_step_lvq(jnp.asarray(bk), jnp.asarray(bp),
                              jnp.asarray(crows), jnp.asarray(sc),
                              jnp.asarray(bi), jnp.asarray(mean[None, :]),
                              jnp.asarray(cids), jnp.asarray(q),
                              n_dead=d_pad - dim, interpret=True,
                              block_rows=8, **args)
        ref = beam_step_reference(
            jnp.asarray(bk), jnp.asarray(bp), jnp.asarray(crows),
            jnp.asarray(cids), jnp.asarray(q),
            decode=(jnp.asarray(sc), jnp.asarray(bi),
                    jnp.asarray(mean[None, :]), d_pad - dim), **args)
        for name, a, b_, c_ in zip(("keys", "packed", "popped",
                                    "pool_keys", "pool_ids"),
                                   plain, fused, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
            np.testing.assert_allclose(np.asarray(b_), np.asarray(c_),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_lvq_search_kernel_path_end_to_end(self, rng, monkeypatch):
        """greedy_search over an LVQ8 dataset via the fused decode kernel
        (interpret mode) matches the XLA LVQ path."""
        import jax as _jax
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        from scalablevectorsearch_tpu.quantization.lvq import LVQDataset
        import scalablevectorsearch_tpu as svt
        data, queries = svt.generate_test_dataset(300, 37, 64, seed=7)
        lvq = LVQDataset.compress(data, bits=8)
        params = VamanaBuildParameters(graph_max_degree=16, window_size=24,
                                       max_candidate_pool_size=60,
                                       prune_to=14, alpha=1.1)
        index = VamanaIndex.build(params, lvq, "l2")
        index.search_window_size = 13
        res_xla = index.search(queries, 7)
        monkeypatch.setenv("SVT_FORCE_BEAM_KERNEL", "1")
        _jax.clear_caches()
        res_kernel = index.search(queries, 7)
        monkeypatch.delenv("SVT_FORCE_BEAM_KERNEL")
        _jax.clear_caches()
        ids_x = np.sort(np.asarray(res_xla.ids), axis=1)
        ids_k = np.sort(np.asarray(res_kernel.ids), axis=1)
        assert (ids_x == ids_k).mean() > 0.98  # fp tie-breaks allowed

    def test_search_kernel_path_end_to_end(self, rng, monkeypatch):
        """greedy_search with the kernel path (interpret mode) returns the
        same neighbors as the XLA path."""
        import jax as _jax
        from scalablevectorsearch_tpu.index.vamana.index import VamanaIndex
        from scalablevectorsearch_tpu.index.vamana.params import (
            VamanaBuildParameters)
        import scalablevectorsearch_tpu as svt
        data, queries = svt.generate_test_dataset(300, 37, 64, seed=7)
        params = VamanaBuildParameters(graph_max_degree=16, window_size=24,
                                       max_candidate_pool_size=60,
                                       prune_to=14)
        index = VamanaIndex.build(params, data, "l2")
        index.search_window_size = 13  # odd shapes: off the jit-cache paths
        res_xla = index.search(queries, 7)
        monkeypatch.setenv("SVT_FORCE_BEAM_KERNEL", "1")
        _jax.clear_caches()  # env is read at trace time
        res_kernel = index.search(queries, 7)
        monkeypatch.delenv("SVT_FORCE_BEAM_KERNEL")
        _jax.clear_caches()
        ids_x = np.sort(np.asarray(res_xla.ids), axis=1)
        ids_k = np.sort(np.asarray(res_kernel.ids), axis=1)
        assert (ids_x == ids_k).mean() > 0.98  # fp tie-breaks allowed
