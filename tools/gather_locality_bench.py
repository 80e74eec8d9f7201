#!/usr/bin/env python
# Evidence for PERF.md round-5 'graph-locality relabel is a dead end':
# run on the TPU platform; ~6 min.
"""Does index locality change the HBM row-gather rate at 10M rows?
If sorted/clustered ids gather faster than random ids, a graph-locality
relabel (round-4 VERDICT stretch-9) would pay; if not, record a dead end."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

n, d = 10_000_000, 128
B = 8192          # rows per gather (one beam step's worth x many queries)
REPS = 200
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))  # 5.1 GB

def make_ids(kind):
    r = rng.integers(0, n, size=(REPS, B)).astype(np.int32)
    if kind == "random":
        return r
    if kind == "sorted":
        return np.sort(r, axis=1)
    if kind == "local4k":   # ids clustered in 4k-row spans (BFS-like)
        base = rng.integers(0, n - 4096, size=(REPS, 1)).astype(np.int32)
        off = rng.integers(0, 4096, size=(REPS, B)).astype(np.int32)
        return base + off
    if kind == "contig":    # perfectly contiguous spans
        base = rng.integers(0, n - B, size=(REPS, 1)).astype(np.int32)
        return base + np.arange(B, dtype=np.int32)[None, :]
    raise ValueError(kind)

import functools
@functools.partial(jax.jit, static_argnames=())
def loop(x, ids):
    def body(i, acc):
        rows = jnp.take(x, ids[i], axis=0)      # (B, d) gather
        return acc + rows[0, 0] * 1e-30
    return jax.lax.fori_loop(0, ids.shape[0], body, jnp.float32(0.0))

for kind in ("random", "sorted", "local4k", "contig"):
    ids = jnp.asarray(make_ids(kind))
    np.asarray(loop(x, ids))          # warm
    t0 = time.time()
    np.asarray(loop(x, ids))
    dt = time.time() - t0
    rows_s = REPS * B / dt
    print(f"{kind:8s}: {rows_s/1e6:8.1f} M rows/s  "
          f"{rows_s*d*4/1e9:7.1f} GB/s  ns/row={1e9/rows_s:.2f}",
          flush=True)
