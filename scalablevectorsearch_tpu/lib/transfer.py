"""Pipelined device->host transfers for multi-GB arrays.

A single blocking ``np.asarray(device_array)`` serializes one tunnel round
trip per internal transfer unit and measured ~2 MB/s on a 5 GB read through
the remote-TPU link (PERF.md round 4) — 45 minutes for what the link can
move in under a minute.  Splitting the array into row chunks, starting
``copy_to_host_async`` on EVERY chunk before the first blocking read, keeps
the tunnel saturated (the same discipline that took e2e serving 16k -> 41k
QPS; see index/vamana/index.py search dispatch).

The reference never needs this — its data lives in host DRAM
(lib/array.h:214 allocates in-process) — it is the remote-accelerator
analog of its mmap'd IO (core/io/native.h:50).
"""

from __future__ import annotations

import numpy as np


def to_host_chunked(arr, row_chunk: int = 1 << 19) -> np.ndarray:
    """Copy a (rows, ...) device array to host, pipelining the tunnel.

    Slices the array into ``row_chunk``-row device views, starts an async
    device->host copy on all of them, then assembles in order.  Peak extra
    device memory is one full copy of ``arr`` (the slices), freed as the
    transfer drains."""
    n = arr.shape[0]
    if n <= row_chunk:
        return np.asarray(arr)
    chunks = [arr[i: i + row_chunk] for i in range(0, n, row_chunk)]
    for c in chunks:
        c.copy_to_host_async()
    out = np.empty(arr.shape, dtype=np.asarray(chunks[0][:0]).dtype)
    pos = 0
    for c in chunks:
        h = np.asarray(c)
        out[pos: pos + h.shape[0]] = h
        pos += h.shape[0]
    return out
