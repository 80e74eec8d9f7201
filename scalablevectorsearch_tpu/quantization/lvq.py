"""LVQ-style per-vector quantization (one- and two-level, 4/8-bit).

The reference ships LVQ (Locally-adaptive Vector Quantization, [ABHT23])
only behind its closed-source runtime ABI (``StorageKind::{LVQ4, LVQ8,
LVQ4x4, LVQ4x8}``, ``bindings/cpp/include/svs/runtime/api_defs.h:98-109``);
SURVEY §2.4 directs this framework to implement an LVQ-style open component.

**Level 1** (``bits`` ∈ {4, 8}): remove the dataset mean, then quantize each
vector with its own (scale, bias) fitted to the row min/max:

    x̂₁ = mean + bias_i + scale_i * c_i,   c_i ∈ {0..2^B1-1} (stored signed)

Per-vector adaptation shrinks quantization error by ~the ratio of global to
per-row dynamic range.  **Level 2** (``residual_bits`` ∈ {0, 4, 8}): the
reconstruction residual r = x - x̂₁ is quantized symmetrically with a second
per-vector scale:

    x̂₂ = x̂₁ + scale2_i * c2_i,   c2_i ∈ [-2^(B2-1), 2^(B2-1)-1]

Graph traversal and flat scans use the *primary* level only (that is the
memory-bandwidth win); the two-level reconstruction is exposed through
``full_view()`` for reranking the final candidates (the reference's
two-level search flow).  4-bit codes are packed two per byte, so LVQ4x8
stores ~12 bits/dim + 16 B/vector of constants.

Distances over the primary are computed in the code domain on the MXU:

    <q, x̂₁> = <q, mean> + bias_i * Σq + scale_i * <q, c_i>

with ``<q, c_i>`` a bf16 x bf16 (query x codes) matmul — no decompression of
the dataset.  L2 uses the stored reconstructed norms via norm algebra.

LVQDataset follows the same dataset protocol as ``core.data.VectorDataset``
(get / norms_sq / tile_keys / pytree), so flat, Vamana, and IVF indexes work
over it unchanged — the analog of the reference's CPO extension wiring.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lib import datatypes as dt
from ..lib import saveload


def _pack4(codes: np.ndarray) -> np.ndarray:
    """Pack signed 4-bit values [-8, 7] two per int8 byte (lo, hi)."""
    u = codes.astype(np.int16) & 0xF
    lo, hi = u[:, 0::2], u[:, 1::2]
    return (lo | (hi << 4)).astype(np.uint8).view(np.int8)


def _unpack4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`_pack4`: (…, w) int8 -> (…, 2w) int8 in [-8, 7]."""
    u = packed.astype(jnp.int32) & 0xFF
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    lo = lo - 16 * (lo > 7)
    hi = hi - 16 * (hi > 7)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1],
                       packed.shape[-1] * 2).astype(jnp.int8)


def affine_decode(codes, scales, biases, mean, *, bits: int, dim: int):
    """THE single implementation of the exact LVQ primary reconstruction
    ``(mean + bias + scale * code) * live``: packed neighborhoods
    (index/vamana/packed.py) and mesh shard views (parallel/sharded.py)
    must be bit-identical to ``LVQDataset.get``, so all three call this.

    ``codes``: (..., w1) stored codes (packed nibbles when bits == 4);
    ``scales``/``biases``: (...,) per-vector constants; ``mean``: (d_pad,).
    """
    if bits == 4:
        codes = _unpack4(codes)
    d_pad = codes.shape[-1]
    live = (jnp.arange(d_pad) < dim).astype(jnp.float32)
    return (mean + biases[..., None]
            + scales[..., None] * codes.astype(jnp.float32)) * live


def _quantize_primary(resid: np.ndarray, bits: int):
    """Per-row min/max fit: returns (codes int8 signed, scales, biases)."""
    levels = (1 << bits) - 1
    half = 1 << (bits - 1)
    lo = resid.min(axis=1)
    hi = resid.max(axis=1)
    scales = np.maximum((hi - lo) / levels, 1e-12)
    biases = lo + half * scales
    codes = np.clip(np.rint((resid - biases[:, None]) / scales[:, None]),
                    -half, half - 1).astype(np.int8)
    return codes, scales.astype(np.float32), biases.astype(np.float32)


def _quantize_residual(resid: np.ndarray, bits: int):
    """Symmetric per-row fit for the second level."""
    half = 1 << (bits - 1)
    scales = np.maximum(np.abs(resid).max(axis=1) / (half - 0.5), 1e-12)
    codes = np.clip(np.rint(resid / scales[:, None]),
                    -half, half - 1).astype(np.int8)
    return codes, scales.astype(np.float32)


@partial(jax.tree_util.register_dataclass,
         data_fields=["codes", "scales", "biases", "mean", "norms_sq",
                      "res_codes", "res_scales", "full_norms_sq"],
         meta_fields=["n", "dim", "bits", "residual_bits"])
@dataclasses.dataclass
class LVQDataset:
    codes: jax.Array         # (capacity, w1) int8; w1 = d_pad / (8 // bits)
    scales: jax.Array        # (capacity,) f32 — per-vector level-1 scale
    biases: jax.Array        # (capacity,) f32 — per-vector level-1 bias
    mean: jax.Array          # (d_pad,) f32 — dataset mean (0 in dead columns)
    norms_sq: jax.Array      # (capacity,) f32 — level-1 recon norms, +inf pad
    res_codes: jax.Array     # (capacity, w2) int8; (capacity, 0) if absent
    res_scales: jax.Array    # (capacity,) f32 — level-2 scale (1.0 if absent)
    full_norms_sq: jax.Array  # (capacity,) f32 — two-level recon norms
    n: int
    dim: int
    bits: int                # 4 or 8
    residual_bits: int       # 0, 4, or 8

    # -- construction ----------------------------------------------------------
    @classmethod
    def compress(cls, x, bits: int = 8, residual_bits: int = 0,
                 capacity: Optional[int] = None) -> "LVQDataset":
        """Fit mean + per-vector (scale, bias) at ``bits``; optionally add a
        ``residual_bits`` second level ([ABHT23] two-level scheme)."""
        if bits not in (4, 8):
            raise ValueError(f"bits must be 4 or 8, got {bits}")
        if residual_bits not in (0, 4, 8):
            raise ValueError(
                f"residual_bits must be 0, 4, or 8, got {residual_bits}")
        x = np.asarray(x, dtype=np.float32)
        n, dim = x.shape
        mean = x.mean(axis=0)
        resid = x - mean
        codes, scales, biases = _quantize_primary(resid, bits)
        recon1 = mean + biases[:, None] + scales[:, None] * \
            codes.astype(np.float32)

        d_pad = dt.padded_dim(dim)
        cap = dt.pad_to(capacity if capacity is not None else n, 32)

        def host_codes(c, b):
            w = d_pad // (8 // b)
            out = np.zeros((cap, w), dtype=np.int8)
            padded = np.zeros((n, d_pad), dtype=np.int8)
            padded[:, :dim] = c
            out[:n] = _pack4(padded) if b == 4 else padded
            return jnp.asarray(out)

        if residual_bits:
            res = x - recon1
            res_c, res_s = _quantize_residual(res, residual_bits)
            recon2 = recon1 + res_s[:, None] * res_c.astype(np.float32)
            res_codes = host_codes(res_c, residual_bits)
        else:
            res_s = np.ones(n, np.float32)
            recon2 = recon1
            res_codes = jnp.zeros((cap, 0), dtype=jnp.int8)

        mean_pad = np.zeros(d_pad, dtype=np.float32)
        mean_pad[:dim] = mean

        def pad1(a, fill=0.0):
            out = np.full(cap, fill, dtype=np.float32)
            out[:n] = a
            return jnp.asarray(out)

        norms = np.full(cap, np.inf, dtype=np.float32)
        norms[:n] = (recon1.astype(np.float64) ** 2).sum(1)
        fnorms = np.full(cap, np.inf, dtype=np.float32)
        fnorms[:n] = (recon2.astype(np.float64) ** 2).sum(1)

        return cls(codes=host_codes(codes, bits), scales=pad1(scales, 1.0),
                   biases=pad1(biases), mean=jnp.asarray(mean_pad),
                   norms_sq=jnp.asarray(norms), res_codes=res_codes,
                   res_scales=pad1(res_s, 1.0),
                   full_norms_sq=jnp.asarray(fnorms),
                   n=n, dim=dim, bits=bits, residual_bits=residual_bits)

    @property
    def kind(self) -> str:
        """Reference ``StorageKind`` name (api_defs.h:98-109)."""
        if self.residual_bits:
            return f"LVQ{self.bits}x{self.residual_bits}"
        return f"LVQ{self.bits}"

    # -- dataset protocol ---------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.codes.shape[1] * (8 // self.bits)

    @property
    def dtype(self):
        return self.codes.dtype

    def _codes_of(self, ids: jax.Array) -> jax.Array:
        rows = jnp.take(self.codes, ids, axis=0, mode="clip")
        return _unpack4(rows) if self.bits == 4 else rows

    def get(self, ids: jax.Array) -> jax.Array:
        """Gather decompressed rows (f32), *primary level only* — this is
        what graph traversal scores against (the bandwidth win).  Use
        :meth:`get_full` / :meth:`full_view` for two-level reconstruction."""
        rows = jnp.take(self.codes, ids, axis=0, mode="clip")
        s = jnp.take(self.scales, ids, axis=0, mode="clip")
        b = jnp.take(self.biases, ids, axis=0, mode="clip")
        return affine_decode(rows, s, b, self.mean,
                             bits=self.bits, dim=self.dim)

    def get_full(self, ids: jax.Array) -> jax.Array:
        """Two-level reconstruction (== get() when residual_bits == 0)."""
        dec = self.get(ids)
        if not self.residual_bits:
            return dec
        rows = jnp.take(self.res_codes, ids, axis=0, mode="clip")
        if self.residual_bits == 4:
            rows = _unpack4(rows)
        rs = jnp.take(self.res_scales, ids, axis=0, mode="clip")
        live = (jnp.arange(self.padded_dim) < self.dim).astype(jnp.float32)
        return dec + rs[..., None] * rows.astype(jnp.float32) * live

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.norms_sq, ids, axis=0, mode="clip")

    def full_view(self) -> "LVQFullView":
        """Dataset view decoding both levels — plug into ``rerank_kernel``
        (the reference's two-level search reranks with the residuals)."""
        return LVQFullView(base=self)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.get_full(jnp.arange(self.n)))[:, : self.dim]

    def with_capacity(self, capacity: int) -> "LVQDataset":
        cap = dt.pad_to(capacity, 32)
        if cap <= self.capacity:
            return self
        g = cap - self.capacity
        return dataclasses.replace(
            self,
            codes=jnp.pad(self.codes, ((0, g), (0, 0))),
            scales=jnp.pad(self.scales, (0, g), constant_values=1.0),
            biases=jnp.pad(self.biases, (0, g)),
            norms_sq=jnp.pad(self.norms_sq, (0, g), constant_values=jnp.inf),
            res_codes=jnp.pad(self.res_codes, ((0, g), (0, 0))),
            res_scales=jnp.pad(self.res_scales, (0, g), constant_values=1.0),
            full_norms_sq=jnp.pad(self.full_norms_sq, (0, g),
                                  constant_values=jnp.inf))

    def tile_keys(self, queries: jax.Array, q_norms: jax.Array,
                  start, tile: int, distance) -> jax.Array:
        """Code-domain distance tile over the MXU (primary level):
        <q, x̂₁> = <q,mean> + b_i * Σ_live q + s_i * <q, c_i>."""
        from ..ops import distance as dist_ops
        distance = dist_ops.as_distance(distance)
        w = self.codes.shape[1]
        xs = jax.lax.dynamic_slice(self.codes, (start, 0), (tile, w))
        if self.bits == 4:
            xs = _unpack4(xs)
        ns = jax.lax.dynamic_slice(self.norms_sq, (start,), (tile,))
        s = jax.lax.dynamic_slice(self.scales, (start,), (tile,))
        b = jax.lax.dynamic_slice(self.biases, (start,), (tile,))

        qf = queries.astype(jnp.float32)
        live = (jnp.arange(self.padded_dim) < self.dim).astype(jnp.float32)
        q_live = qf * live
        q_mean = q_live @ self.mean                      # (B,)
        q_sum = jnp.sum(q_live, axis=-1)                 # (B,)
        dots_c = jax.lax.dot_general(
            q_live.astype(jnp.bfloat16), xs.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, tile)
        dots = q_mean[:, None] + b[None, :] * q_sum[:, None] \
            + s[None, :] * dots_c
        inf_mask = jnp.where(jnp.isinf(ns)[None, :], jnp.inf, 0.0)
        if distance == dist_ops.DistanceType.MIP:
            return -dots + inf_mask
        if distance == dist_ops.DistanceType.L2:
            keys = q_norms[:, None] - 2.0 * dots + ns[None, :]
            return jnp.maximum(keys, 0.0) + inf_mask
        denom = jnp.sqrt(jnp.maximum(q_norms[:, None], 1e-30)) * \
            jnp.sqrt(jnp.where(jnp.isinf(ns), 1.0, ns))[None, :]
        return -dots / denom + inf_mask

    # -- persistence -----------------------------------------------------------------
    SCHEMA = "lvq_dataset"
    VERSION = saveload.Version(0, 0, 2)

    def save(self, ctx: saveload.SaveContext) -> dict:
        table = {
            "name": "lvq dataset",
            "codes": ctx.save_array(np.asarray(self.codes[: self.n])),
            "scales": ctx.save_array(np.asarray(self.scales[: self.n])),
            "biases": ctx.save_array(np.asarray(self.biases[: self.n])),
            "mean": ctx.save_array(np.asarray(self.mean[: self.dim])),
            "dims": self.dim,
            "num_vectors": self.n,
            "bits": self.bits,
            "residual_bits": self.residual_bits,
        }
        if self.residual_bits:
            table["res_codes"] = ctx.save_array(
                np.asarray(self.res_codes[: self.n]))
            table["res_scales"] = ctx.save_array(
                np.asarray(self.res_scales[: self.n]))
        return saveload.save_table(self.SCHEMA, self.VERSION, table)

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext, **_) -> "LVQDataset":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        bits = int(table.get("bits", 8))
        residual_bits = int(table.get("residual_bits", 0))
        codes = ctx.load_array(table["codes"]).astype(np.int8)
        scales = ctx.load_array(table["scales"]).astype(np.float32)
        biases = ctx.load_array(table["biases"]).astype(np.float32)
        mean = ctx.load_array(table["mean"]).astype(np.float32)
        n = int(table["num_vectors"])
        dim = int(table["dims"])
        d_pad = dt.padded_dim(dim)
        w1 = d_pad // (8 // bits)
        cap = dt.pad_to(n, 32)

        # v0.0.1 files stored unpadded unpacked codes (n, dim); v0.0.2 stores
        # the padded (possibly packed) rows directly.
        host = np.zeros((cap, w1), dtype=np.int8)
        if codes.shape[1] == w1:
            host[:n] = codes
        else:
            padded = np.zeros((n, d_pad), dtype=np.int8)
            padded[:, : codes.shape[1]] = codes
            host[:n] = _pack4(padded) if bits == 4 else padded

        mean_pad = np.zeros(d_pad, np.float32)
        mean_pad[:dim] = mean

        obj = cls(codes=jnp.asarray(host),
                  scales=_pad1(scales, cap, 1.0),
                  biases=_pad1(biases, cap),
                  mean=jnp.asarray(mean_pad),
                  norms_sq=jnp.full(cap, jnp.inf, jnp.float32),
                  res_codes=jnp.zeros((cap, 0), jnp.int8),
                  res_scales=jnp.ones(cap, jnp.float32),
                  full_norms_sq=jnp.full(cap, jnp.inf, jnp.float32),
                  n=n, dim=dim, bits=bits, residual_bits=0)
        if residual_bits:
            res_codes = ctx.load_array(table["res_codes"]).astype(np.int8)
            res_scales = ctx.load_array(
                table["res_scales"]).astype(np.float32)
            w2 = d_pad // (8 // residual_bits)
            rhost = np.zeros((cap, w2), dtype=np.int8)
            rhost[:n] = res_codes
            obj = dataclasses.replace(
                obj, res_codes=jnp.asarray(rhost),
                res_scales=_pad1(res_scales, cap, 1.0),
                residual_bits=residual_bits)
        # recompute recon norms on device, CHUNKED with donated buffers so
        # the transient decode is one (chunk, d_pad) f32 block instead of a
        # full (capacity, d_pad) materialization (a 10Mx128 load would OOM
        # on the decode before the codes themselves do)
        chunk = 65536
        n1 = jnp.full(cap, jnp.inf, jnp.float32)
        n2 = jnp.full(cap, jnp.inf, jnp.float32)
        start = 0
        while start < cap:
            rows = min(chunk, cap - start)
            n1, n2 = _norms_chunk(n1, n2, obj, jnp.int32(start),
                                  jnp.int32(n), rows=rows)
            start += rows
        return dataclasses.replace(obj, norms_sq=n1, full_norms_sq=n2)


def _pad1(a: np.ndarray, cap: int, fill: float = 0.0) -> jax.Array:
    out = np.full(cap, fill, dtype=np.float32)
    out[: a.shape[0]] = a
    return jnp.asarray(out)


def compress_and_save_host(directory: str, x, bits: int = 8,
                           residual_bits: int = 0) -> None:
    """Compress + persist in one pass WITHOUT creating device arrays.

    ``LVQDataset.compress`` returns device-resident arrays, so saving its
    result reads the multi-GB code planes back off the chip — through the
    remote-TPU tunnel a blocking multi-GB device->host read runs at
    ~2 MB/s (PERF.md round 4).  10M-scale cache-building passes persist
    straight from the host quantization math instead.  The on-disk format
    is identical to :meth:`LVQDataset.save` (v0.0.2 padded, packed rows),
    so ``dispatch_load`` reads either."""
    import json
    import os

    if bits not in (4, 8) or residual_bits not in (0, 4, 8):
        raise ValueError(f"unsupported ({bits}, {residual_bits})")
    x = np.asarray(x, dtype=np.float32)
    n, dim = x.shape
    mean = x.mean(axis=0)
    codes, scales, biases = _quantize_primary(x - mean, bits)
    d_pad = dt.padded_dim(dim)

    def packed(c, b):
        padded = np.zeros((n, d_pad), dtype=np.int8)
        padded[:, :dim] = c
        return _pack4(padded) if b == 4 else padded

    ctx = saveload.SaveContext(directory)
    table = {
        "name": "lvq dataset",
        "codes": ctx.save_array(packed(codes, bits)),
        "scales": ctx.save_array(np.asarray(scales, np.float32)),
        "biases": ctx.save_array(np.asarray(biases, np.float32)),
        "mean": ctx.save_array(np.asarray(mean, np.float32)),
        "dims": dim,
        "num_vectors": n,
        "bits": bits,
        "residual_bits": residual_bits,
    }
    if residual_bits:
        recon1 = mean + biases[:, None] + \
            scales[:, None] * codes.astype(np.float32)
        res_c, res_s = _quantize_residual(x - recon1, residual_bits)
        del recon1
        table["res_codes"] = ctx.save_array(packed(res_c, residual_bits))
        table["res_scales"] = ctx.save_array(np.asarray(res_s, np.float32))
    full = saveload.save_table(LVQDataset.SCHEMA, LVQDataset.VERSION, table)
    with open(os.path.join(directory, saveload.CONFIG_FILENAME), "w") as f:
        json.dump(full, f, indent=2)


@partial(jax.jit, donate_argnums=(0, 1), static_argnames=("rows",))
def _norms_chunk(n1, n2, ds: "LVQDataset", start, n_live, *, rows: int):
    """Fill ``n1/n2[start:start+rows]`` with primary / two-level recon norms
    in place (donated buffers; +inf past ``n_live``)."""
    ids = start + jnp.arange(rows, dtype=jnp.int32)
    live = ids < n_live
    a = jnp.where(live, jnp.sum(ds.get(ids) ** 2, axis=1), jnp.inf)
    b = jnp.where(live, jnp.sum(ds.get_full(ids) ** 2, axis=1), jnp.inf)
    return (jax.lax.dynamic_update_slice(n1, a, (start,)),
            jax.lax.dynamic_update_slice(n2, b, (start,)))


@partial(jax.tree_util.register_dataclass, data_fields=["base"],
         meta_fields=[])
@dataclasses.dataclass
class LVQFullView:
    """Two-level reconstruction view of an :class:`LVQDataset` — implements
    enough of the dataset protocol for reranking (get / norms_sq / n)."""

    base: LVQDataset

    @property
    def n(self) -> int:
        return self.base.n

    @property
    def dim(self) -> int:
        return self.base.dim

    @property
    def capacity(self) -> int:
        return self.base.capacity

    @property
    def padded_dim(self) -> int:
        return self.base.padded_dim

    @property
    def norms_sq(self) -> jax.Array:
        return self.base.full_norms_sq

    def get(self, ids: jax.Array) -> jax.Array:
        return self.base.get_full(ids)

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.base.get_full(ids)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.base.full_norms_sq, ids, axis=0, mode="clip")

    def with_capacity(self, capacity: int) -> "LVQFullView":
        return LVQFullView(base=self.base.with_capacity(capacity))

    def tile_keys(self, queries: jax.Array, q_norms: jax.Array,
                  start, tile: int, distance) -> jax.Array:
        """Two-level decode tile + pairwise keys (build-time medioid etc.)."""
        from ..ops import distance as dist_ops
        ids = start + jnp.arange(tile, dtype=jnp.int32)
        rows = self.base.get_full(ids)
        return dist_ops.pairwise_keys(
            dist_ops.as_distance(distance), queries, rows,
            vector_norms_sq=self.norms_of(ids), query_norms_sq=q_norms)
