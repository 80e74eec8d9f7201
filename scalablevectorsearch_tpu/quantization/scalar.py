"""Global scalar quantization (SQ).

TPU-native analog of the reference's ``SQDataset``
(``include/svs/quantization/scalar/scalar.h:364-545``): int8 (or uint8/int16)
codes with one global ``scale``/``bias`` pair fitted to the dataset min/max.

The reference's trick — compute distances in the *compressed* domain without
per-candidate decompression (``scalar.h:58-153``) — maps even better to TPU:

* **L2**: compress the query once per search, compute int-domain differences,
  scale by ``scale^2``: ``||s(q')-s(x')||^2 * scale^2 == ||q-x||^2`` up to
  quantization error (reference L2 functor, scalar.h:58-105).
  On the MXU we use norm algebra over the int8 codes with an f32 accumulate —
  int8 matmuls run at the MXU's highest rate.
* **MIP**: ``dot(q, x) ≈ scale^2*dot(q',x') + scale*bias*(Σq' + Σx') +
  d*bias^2`` where primes are codes; the per-row code sums are precomputed
  (generalizes reference scalar.h:107-153, which keeps the query
  uncompressed; compressing the query too keeps the matmul int8xint8).
* **Cosine**: same dot plus norms derived from the code norms.

``SQDataset`` quacks like ``core.data.VectorDataset`` (get / norms_sq /
pytree), so every index works over it unchanged — the analog of the
reference's CPO extension wiring (``extensions/vamana/scalar.h`` etc.).
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
         data_fields=["codes", "norms_sq", "code_sums", "scale", "bias"],
         meta_fields=["n", "dim"])
@dataclasses.dataclass
class SQDataset:
    """Scalar-quantized dataset: codes + global (scale, bias).

    Reconstruction: ``x ≈ codes * scale + bias`` (reference scalar.h:434).
    ``norms_sq`` holds *reconstructed* squared norms (f32, +inf padding) so
    the norm-algebra distance path works identically to VectorDataset.
    ``code_sums`` holds per-row Σcodes (f32) for the MIP/cosine correction
    terms.
    """

    codes: jax.Array        # (capacity, d_pad) int8 / uint8 / int16
    norms_sq: jax.Array     # (capacity,) f32 — reconstructed-vector norms
    code_sums: jax.Array    # (capacity,) f32 — Σ codes per row
    scale: jax.Array        # () f32
    bias: jax.Array         # () f32
    n: int
    dim: int

    # -- construction -------------------------------------------------------
    @classmethod
    def compress(cls, x, dtype=jnp.int8, capacity: Optional[int] = None
                 ) -> "SQDataset":
        """Fit global min/max and quantize (reference scalar.h:199-251).

        Codes c = round((x - bias) / scale) clamped to the dtype range, with
        scale = (max - min) / (2^bits - 1) and bias centering the codes in
        the dtype's range.  Generic over integer code element types —
        int8 / uint8 / int16 — like the reference's template parameter
        (scalar.h:363)."""
        x = np.asarray(x, dtype=np.float32)
        n, dim = x.shape
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        if np_dtype not in (np.dtype(np.int8), np.dtype(np.uint8),
                            np.dtype(np.int16)):
            raise ValueError(
                f"SQ codes must be int8/uint8/int16, got {np_dtype}")
        info = np.iinfo(np_dtype)
        lo, hi = float(x.min()), float(x.max())
        levels = float(info.max - info.min)
        scale = max((hi - lo) / levels, 1e-12)
        bias = lo - info.min * scale        # code info.min decodes to `lo`
        codes = np.clip(np.rint((x - bias) / scale),
                        info.min, info.max).astype(np_dtype)

        d_pad = dt.padded_dim(dim)
        cap = dt.pad_to(capacity if capacity is not None else n, 32)
        host = np.zeros((cap, d_pad), dtype=np_dtype)
        host[:n, :dim] = codes
        codes_dev = jnp.asarray(host)

        # padding columns decode to `bias` NOT 0 — account in sums/norms by
        # treating only the first `dim` columns as live.
        recon = codes[:, :dim].astype(np.float32) * scale + bias
        norms = np.full((cap,), np.inf, dtype=np.float32)
        norms[:n] = (recon ** 2).sum(axis=1)
        sums = np.zeros((cap,), dtype=np.float32)
        sums[:n] = codes[:, :dim].astype(np.float32).sum(axis=1)
        return cls(codes=codes_dev, norms_sq=jnp.asarray(norms),
                   code_sums=jnp.asarray(sums),
                   scale=jnp.float32(scale), bias=jnp.float32(bias),
                   n=n, dim=dim)

    # -- VectorDataset protocol ----------------------------------------------
    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def padded_dim(self) -> int:
        return self.codes.shape[1]

    @property
    def dtype(self):
        return self.codes.dtype

    @property
    def vectors(self) -> jax.Array:
        """Decompressed padded matrix (f32).  Zero-pads dead columns.

        NOTE: materializes the full decode — use only for small datasets /
        debugging; the distance paths never call this.
        """
        live = jnp.arange(self.padded_dim) < self.dim
        dec = self.codes.astype(jnp.float32) * self.scale + self.bias
        return jnp.where(live[None, :], dec, 0.0)

    def get(self, ids: jax.Array) -> jax.Array:
        """Gather *decompressed* rows (f32) — the DecompressionAdaptor path
        (reference scalar.h:548): build-time pruning and beam scoring operate
        on reconstructed vectors."""
        rows = jnp.take(self.codes, ids, axis=0, mode="clip")
        live = jnp.arange(self.padded_dim) < self.dim
        dec = rows.astype(jnp.float32) * self.scale + self.bias
        return jnp.where(live[None, None, :] if rows.ndim == 3
                         else live[None, :], dec, 0.0)

    def get_f32(self, ids: jax.Array) -> jax.Array:
        return self.get(ids)

    def norms_of(self, ids: jax.Array) -> jax.Array:
        """Reconstructed squared norms for gathered ids (dataset protocol —
        graph build / consolidate query-norm fetch)."""
        return jnp.take(self.norms_sq, ids, axis=0, mode="clip")

    def to_numpy(self) -> np.ndarray:
        """Reconstructed vectors (n, dim) — reference DecompressionAccessor
        (scalar.h:608)."""
        codes = np.asarray(self.codes[: self.n, : self.dim], dtype=np.float32)
        return codes * float(self.scale) + float(self.bias)

    def with_capacity(self, capacity: int) -> "SQDataset":
        cap = dt.pad_to(capacity, 32)
        if cap <= self.capacity:
            return self
        grow = cap - self.capacity
        return dataclasses.replace(
            self,
            codes=jnp.pad(self.codes, ((0, grow), (0, 0))),
            norms_sq=jnp.pad(self.norms_sq, (0, grow),
                             constant_values=jnp.inf),
            code_sums=jnp.pad(self.code_sums, (0, grow)))

    def quantize_queries(self, queries: jax.Array) -> jax.Array:
        """Quantize f32 queries into the code domain (the L2 functor's
        fix_argument step, reference scalar.h:58-105).  Dead (padding)
        columns map to 0 so code-domain matmuls see them as no-ops."""
        info = np.iinfo(np.dtype(jnp.dtype(self.codes.dtype).name))
        live = jnp.arange(self.padded_dim) < self.dim
        q = jnp.clip(jnp.rint((queries - self.bias) / self.scale),
                     info.min, info.max)
        return jnp.where(live[None, :], q, 0.0).astype(self.codes.dtype)

    def tile_keys(self, queries: jax.Array, q_norms: jax.Array,
                  start, tile: int, distance) -> jax.Array:
        """Code-domain distance tile: int8 x int8 MXU matmul + affine
        correction — no decompression (reference scalar.h:58-153 semantics,
        extensions/flat/scalar.h wiring).

        With x̂ = s·x' + b over `dim` live columns and q̂ likewise:
          <q̂, x̂> = s^2 <q', x'> + s·b(Σq' + Σx') + dim·b^2
        """
        from ..ops import distance as dist_ops
        distance = dist_ops.as_distance(distance)
        xs = jax.lax.dynamic_slice(self.codes, (start, 0),
                                   (tile, self.padded_dim))
        ns = jax.lax.dynamic_slice(self.norms_sq, (start,), (tile,))
        xsums = jax.lax.dynamic_slice(self.code_sums, (start,), (tile,))

        qc = self.quantize_queries(queries)
        qsums = jnp.sum(qc.astype(jnp.float32), axis=-1)
        if self.codes.dtype in (jnp.int8, jnp.uint8):
            # 8-bit x 8-bit -> int32 runs at the MXU's highest rate and is
            # exact (255^2 * d < 2^31 at any realistic d)
            dots_i = jax.lax.dot_general(
                qc, xs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            # int16 codes: int32 accumulation would overflow
            # (|c|^2 * d > 2^31 at d=128); accumulate in f32 at HIGHEST —
            # TPU's default 1-pass bf16 matmul cannot represent 16-bit code
            # values (8-bit mantissa), which would corrupt the distances far
            # beyond the quantization step
            dots_i = jax.lax.dot_general(
                qc.astype(jnp.float32), xs.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        s, b = self.scale, self.bias
        dots = (s * s) * dots_i + (s * b) * (qsums[:, None]
                                             + xsums[None, :]) \
            + jnp.float32(self.dim) * b * b
        if distance == dist_ops.DistanceType.MIP:
            return -dots + jnp.where(jnp.isinf(ns)[None, :], jnp.inf, 0.0)
        if distance == dist_ops.DistanceType.L2:
            # reconstructed-query norm keeps the ranking identity exact in
            # the code domain
            qrn = (s * s) * jnp.sum(
                qc.astype(jnp.float32) ** 2, axis=-1) + \
                2.0 * (s * b) * qsums + jnp.float32(self.dim) * b * b
            keys = qrn[:, None] - 2.0 * dots + ns[None, :]
            return jnp.maximum(keys, 0.0) + jnp.where(
                jnp.isinf(ns)[None, :], jnp.inf, 0.0)
        denom = jnp.sqrt(jnp.maximum(q_norms[:, None], 1e-30)) * \
            jnp.sqrt(jnp.where(jnp.isinf(ns), 1.0, ns))[None, :]
        keys = -dots / denom
        return keys + jnp.where(jnp.isinf(ns)[None, :], jnp.inf, 0.0)

    def decompress(self, ids) -> np.ndarray:
        ids = np.asarray(ids)
        rows = np.asarray(self.codes)[ids][..., : self.dim].astype(np.float32)
        return rows * float(self.scale) + float(self.bias)

    # -- persistence ------------------------------------------------------------
    SCHEMA = "sq_dataset"
    VERSION = saveload.Version(0, 0, 1)

    def save(self, ctx: saveload.SaveContext) -> dict:
        blob = ctx.save_array(np.asarray(self.codes[: self.n, : self.dim]))
        return saveload.save_table(self.SCHEMA, self.VERSION, {
            "name": "scalar quantized dataset",
            "binary_file": blob,
            "dims": self.dim,
            "num_vectors": self.n,
            "eltype": np.dtype(jnp.dtype(self.codes.dtype).name).name,
            "scale": float(self.scale),
            "bias": float(self.bias),
        })

    @classmethod
    def load(cls, table: dict, ctx: saveload.LoadContext, **_) -> "SQDataset":
        saveload.check_table(table, cls.SCHEMA, cls.VERSION)
        eltype = np.dtype(table.get("eltype", "int8"))
        codes = ctx.load_array(table["binary_file"]).astype(eltype)
        n, dim = codes.shape
        scale, bias = table["scale"], table["bias"]
        d_pad = dt.padded_dim(dim)
        cap = dt.pad_to(n, 32)
        host = np.zeros((cap, d_pad), dtype=eltype)
        host[:n, :dim] = codes
        recon = codes.astype(np.float32) * scale + bias
        norms = np.full((cap,), np.inf, dtype=np.float32)
        norms[:n] = (recon ** 2).sum(axis=1)
        sums = np.zeros((cap,), dtype=np.float32)
        sums[:n] = codes.astype(np.float32).sum(axis=1)
        return cls(codes=jnp.asarray(host), norms_sq=jnp.asarray(norms),
                   code_sums=jnp.asarray(sums), scale=jnp.float32(scale),
                   bias=jnp.float32(bias), n=n, dim=dim)

    # -- quantization error -------------------------------------------------------
    def max_abs_error(self) -> float:
        return float(self.scale) / 2.0
