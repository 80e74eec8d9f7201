"""LVQ-style per-vector quantization.

The reference ships LVQ (Locally-adaptive Vector Quantization, [ABHT23])
only behind its closed-source runtime ABI (``StorageKind::LVQ8`` etc.,
``bindings/cpp/include/svs/runtime/api_defs.h:98-109``); SURVEY §2.4 directs
this framework to implement an LVQ-style open component.

Scheme (one-level LVQ-8): remove the dataset mean, then quantize each vector
with its own (scale, bias) fitted to the row min/max:

    x̂ = mean + bias_i + scale_i * c_i,   c_i ∈ int8^d

Per-vector adaptation shrinks quantization error by ~the ratio of global to
per-row dynamic range.  Distances are computed in the code domain on the MXU:

    <q, x̂> = <q, mean> + bias_i * Σq + scale_i * <q, c_i>

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


@partial(jax.tree_util.register_dataclass,
         data_fields=["codes", "scales", "biases", "mean", "norms_sq",
                      "code_sums"],
         meta_fields=["n", "dim"])
@dataclasses.dataclass
class LVQDataset:
    codes: jax.Array      # (capacity, d_pad) int8
    scales: jax.Array     # (capacity,) f32 — per-vector scale
    biases: jax.Array     # (capacity,) f32 — per-vector bias
    mean: jax.Array       # (d_pad,) f32 — dataset mean (0 in dead columns)
    norms_sq: jax.Array   # (capacity,) f32 — reconstructed norms, +inf pad
    code_sums: jax.Array  # (capacity,) f32 — Σ codes per row
    n: int
    dim: int

    # -- construction ----------------------------------------------------------
    @classmethod
    def compress(cls, x, capacity: Optional[int] = None) -> "LVQDataset":
        """Fit mean + per-vector (scale, bias); 8-bit codes."""
        x = np.asarray(x, dtype=np.float32)
        n, dim = x.shape
        mean = x.mean(axis=0)
        resid = x - mean
        lo = resid.min(axis=1)
        hi = resid.max(axis=1)
        scales = np.maximum((hi - lo) / 255.0, 1e-12)
        biases = lo + 128.0 * scales
        codes = np.clip(np.rint((resid - biases[:, None]) / scales[:, None]),
                        -128, 127).astype(np.int8)

        d_pad = dt.padded_dim(dim)
        cap = dt.pad_to(capacity if capacity is not None else n, 32)
        host_codes = np.zeros((cap, d_pad), dtype=np.int8)
        host_codes[:n, :dim] = codes
        mean_pad = np.zeros(d_pad, dtype=np.float32)
        mean_pad[:dim] = mean

        recon = mean + biases[:, None] + scales[:, None] * \
            codes.astype(np.float32)
        norms = np.full(cap, np.inf, dtype=np.float32)
        norms[:n] = (recon.astype(np.float64) ** 2).sum(1)
        sums = np.zeros(cap, dtype=np.float32)
        sums[:n] = codes.astype(np.float32).sum(1)

        def pad1(a, fill=0.0):
            out = np.full(cap, fill, dtype=np.float32)
            out[:n] = a
            return jnp.asarray(out)

        return cls(codes=jnp.asarray(host_codes), scales=pad1(scales, 1.0),
                   biases=pad1(biases), mean=jnp.asarray(mean_pad),
                   norms_sq=jnp.asarray(norms), code_sums=jnp.asarray(sums),
                   n=n, dim=dim)

    # -- dataset protocol ---------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.codes.shape[1]

    @property
    def dtype(self):
        return self.codes.dtype

    def get(self, ids: jax.Array) -> jax.Array:
        """Gather decompressed rows (f32): mean + bias + scale * codes.
        Dead columns decode to 0 (mean is 0 there; bias applies only to live
        columns via masking)."""
        rows = jnp.take(self.codes, ids, axis=0, mode="clip")
        s = jnp.take(self.scales, ids, axis=0, mode="clip")
        b = jnp.take(self.biases, ids, axis=0, mode="clip")
        live = (jnp.arange(self.padded_dim) < self.dim).astype(jnp.float32)
        dec = (self.mean + b[..., None]
               + s[..., None] * rows.astype(jnp.float32))
        return dec * live

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def to_numpy(self) -> np.ndarray:
        codes = np.asarray(self.codes[: self.n, : self.dim],
                           dtype=np.float32)
        return (np.asarray(self.mean[: self.dim])
                + np.asarray(self.biases[: self.n])[:, None]
                + np.asarray(self.scales[: self.n])[:, None] * codes)

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
            code_sums=jnp.pad(self.code_sums, (0, g)))

    def tile_keys(self, queries: jax.Array, q_norms: jax.Array,
                  start, tile: int, distance) -> jax.Array:
        """Code-domain distance tile over the MXU:
        <q, x̂> = <q, mean> + bias_i Σ_live(q...) — precisely:
        <q, x̂> = <q,mean> + b_i * sum(q over live dims)? No: b_i multiplies
        the all-ones live vector, so the term is b_i * Σ_live q; the code
        term is s_i * <q, c_i>."""
        from ..ops import distance as dist_ops
        distance = dist_ops.as_distance(distance)
        xs = jax.lax.dynamic_slice(self.codes, (start, 0),
                                   (tile, self.padded_dim))
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
    VERSION = saveload.Version(0, 0, 1)

    def save(self, ctx: saveload.SaveContext) -> dict:
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "lvq dataset",
            "codes": ctx.save_array(
                np.asarray(self.codes[: self.n, : self.dim])),
            "scales": ctx.save_array(np.asarray(self.scales[: self.n])),
            "biases": ctx.save_array(np.asarray(self.biases[: self.n])),
            "mean": ctx.save_array(np.asarray(self.mean[: self.dim])),
            "dims": self.dim,
            "num_vectors": self.n,
        })

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext, **_) -> "LVQDataset":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        codes = ctx.load_array(table["codes"]).astype(np.int8)
        scales = ctx.load_array(table["scales"]).astype(np.float32)
        biases = ctx.load_array(table["biases"]).astype(np.float32)
        mean = ctx.load_array(table["mean"]).astype(np.float32)
        n, dim = codes.shape
        d_pad = dt.padded_dim(dim)
        cap = dt.pad_to(n, 32)
        host = np.zeros((cap, d_pad), dtype=np.int8)
        host[:n, :dim] = codes
        mean_pad = np.zeros(d_pad, np.float32)
        mean_pad[:dim] = mean
        recon = mean + biases[:, None] + scales[:, None] * \
            codes.astype(np.float32)
        norms = np.full(cap, np.inf, np.float32)
        norms[:n] = (recon ** 2).sum(1)
        sums = np.zeros(cap, np.float32)
        sums[:n] = codes.astype(np.float32).sum(1)

        def pad1(a, fill=0.0):
            out = np.full(cap, fill, np.float32)
            out[:n] = a
            return jnp.asarray(out)

        return cls(codes=jnp.asarray(host), scales=pad1(scales, 1.0),
                   biases=pad1(biases), mean=jnp.asarray(mean_pad),
                   norms_sq=jnp.asarray(norms), code_sums=jnp.asarray(sums),
                   n=n, dim=dim)
