"""Data type registry and padding helpers.

TPU-native analog of the reference's ``lib/datatype.h`` (``DataType`` enum at
``include/svs/lib/datatype.h:53``).  Instead of a C++ type-erasure layer we map
a small closed set of element types onto jnp dtypes and provide the padding
arithmetic every container in the framework uses: feature dimensions are padded
to the TPU lane width (128) and row counts to the sublane tile for the dtype,
so that every array the compute path touches is MXU/VPU tileable.
"""

from __future__ import annotations

import enum
from typing import Union

import jax.numpy as jnp
import numpy as np

LANE = 128  # TPU lane width: last-dim tiling unit.


class DataType(enum.Enum):
    """Closed set of supported element types (reference: lib/datatype.h:53)."""

    uint8 = "uint8"
    int8 = "int8"
    uint16 = "uint16"
    int16 = "int16"
    uint32 = "uint32"
    int32 = "int32"
    uint64 = "uint64"
    int64 = "int64"
    float16 = "float16"
    bfloat16 = "bfloat16"
    float32 = "float32"
    float64 = "float64"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.value)

    @property
    def np_dtype(self):
        # bfloat16 has no native numpy dtype; ml_dtypes (vendored with jax)
        # provides one through jnp.
        return jnp.dtype(self.value)

    @property
    def itemsize(self) -> int:
        return jnp.dtype(self.value).itemsize


_DTYPE_ALIASES = {
    "float": "float32",
    "half": "float16",
    "bf16": "bfloat16",
    "f32": "float32",
    "f16": "float16",
    "i8": "int8",
    "u8": "uint8",
}


def as_datatype(x: Union[str, DataType, np.dtype, jnp.dtype]) -> DataType:
    if isinstance(x, DataType):
        return x
    name = str(jnp.dtype(x).name) if not isinstance(x, str) else x
    name = _DTYPE_ALIASES.get(name, name)
    return DataType(name)


def sublane(dtype) -> int:
    """Minimum second-to-last-dim tile for a dtype (pallas_guide: tiling table)."""
    size = jnp.dtype(dtype).itemsize
    if size >= 4:
        return 8
    if size == 2:
        return 16
    return 32


def pad_to(x: int, multiple: int) -> int:
    """Round ``x`` up to a multiple of ``multiple`` (minimum one tile)."""
    if x <= 0:
        return multiple
    return ((x + multiple - 1) // multiple) * multiple


def padded_dim(dim: int) -> int:
    """Feature dims pad to the lane width so rows are whole vector registers."""
    return pad_to(dim, LANE)


def padded_count(n: int, dtype=jnp.float32) -> int:
    """Row counts pad to the dtype's sublane tile."""
    return pad_to(n, sublane(dtype))


def pad_matrix(x: np.ndarray, n_pad: int | None = None, d_pad: int | None = None,
               fill=0) -> np.ndarray:
    """Zero-pad a host (n, d) matrix to (n_pad, d_pad)."""
    n, d = x.shape
    if n_pad is None:
        n_pad = padded_count(n, x.dtype)
    if d_pad is None:
        d_pad = padded_dim(d)
    if n_pad == n and d_pad == d:
        return x
    out = np.full((n_pad, d_pad), fill, dtype=x.dtype)
    out[:n, :d] = x
    return out
