"""Dtype registry and packed sub-byte layout spec for piquant-tpu.

TPU-native re-design of the reference dtype system (reference:
include/piquant.hpp:36-197 — enum `dtype`, `dtype_info` table, `dtype_limits`,
packed carrier types `uint2_t`/`uint4_t`).  Instead of C++ traits we keep a
plain-Python registry of `QDType` records; packed sub-byte types are described
by a `pack_factor` (codes per storage byte) plus a fixed bit order.

Packing convention (wire ABI, must match the reference for torch interop):
  * uint4 / int4: two 4-bit codes per byte, FIRST element in the LOW nibble
    (reference: src/kernels/quantize.inl:37-41).
  * uint2: four 2-bit codes per byte, LSB-first
    (reference: src/kernels/quantize.inl:43-50).
  * Unused tail bits in the final byte are zero
    (reference: src/kernels/quantize.inl:67-70, 90-98).

The reference snapshot supports exactly {f32, bf16} x {uint2, uint4, uint8}
(include/piquant.hpp:36-45).  Per BASELINE.json, this framework extends the
matrix to f32/f64/bf16 <-> (u)int4/8/16/32/64 (+ the reference's uint2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = [
    "QDType",
    "DTYPES",
    "dtype_of",
    "packed_numel",
    "tail_mask",
    "f32",
    "f64",
    "bf16",
    "uint2",
    "uint4",
    "uint8",
    "uint16",
    "uint32",
    "uint64",
    "int4",
    "int8",
    "int16",
    "int32",
    "int64",
    "FLOAT_DTYPES",
    "QUANT_DTYPES",
]


@dataclasses.dataclass(frozen=True)
class QDType:
    """One entry of the dtype registry.

    Mirrors the reference `dtype_info` record (include/piquant.hpp:142-163):
    bit size, signedness/kind flags and storage stride — plus the JAX dtypes
    used for storage and for compute.
    """

    name: str
    bits: int                  # logical bits per element
    kind: str                  # 'float' | 'uint' | 'int'
    storage: jnp.dtype         # in-memory carrier dtype (uint8 for packed)
    compute: jnp.dtype         # dtype used for arithmetic on codes / values

    @property
    def is_float(self) -> bool:
        return self.kind == "float"

    @property
    def is_quant(self) -> bool:
        return self.kind in ("uint", "int")

    @property
    def is_signed(self) -> bool:
        return self.kind in ("int", "float")

    @property
    def is_packed(self) -> bool:
        """True for sub-byte types stored several codes per byte."""
        return self.is_quant and self.bits < 8

    @property
    def pack_factor(self) -> int:
        """Number of codes per storage byte (1 for unpacked types)."""
        return 8 // self.bits if self.is_packed else 1

    @property
    def qmin(self) -> int:
        if not self.is_quant:
            raise ValueError(f"{self.name} is not a quantized dtype")
        return -(1 << (self.bits - 1)) if self.kind == "int" else 0

    @property
    def qmax(self) -> int:
        if not self.is_quant:
            raise ValueError(f"{self.name} is not a quantized dtype")
        if self.kind == "int":
            return (1 << (self.bits - 1)) - 1
        if self.bits == 64:
            # uint64 codes are capped at int64 max so code arithmetic stays
            # exact in the int64 domain (same cap as csrc/piquant_host.cpp).
            return (1 << 63) - 1
        return (1 << self.bits) - 1

    @property
    def stride(self) -> int:
        """Bytes per storage element (min 1, like reference dtype_info.stride)."""
        return max(1, self.bits // 8)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"QDType({self.name})"


def _q(name: str, bits: int, kind: str, storage, compute) -> QDType:
    return QDType(name, bits, kind, jnp.dtype(storage), jnp.dtype(compute))


# --- the registry -----------------------------------------------------------
f32 = _q("f32", 32, "float", jnp.float32, jnp.float32)
f64 = _q("f64", 64, "float", jnp.float64, jnp.float64)
bf16 = _q("bf16", 16, "float", jnp.bfloat16, jnp.float32)

uint2 = _q("uint2", 2, "uint", jnp.uint8, jnp.int32)
uint4 = _q("uint4", 4, "uint", jnp.uint8, jnp.int32)
uint8 = _q("uint8", 8, "uint", jnp.uint8, jnp.int32)
uint16 = _q("uint16", 16, "uint", jnp.uint16, jnp.int32)
uint32 = _q("uint32", 32, "uint", jnp.uint32, jnp.int64)
uint64 = _q("uint64", 64, "uint", jnp.uint64, jnp.uint64)
int4 = _q("int4", 4, "int", jnp.uint8, jnp.int32)
int8 = _q("int8", 8, "int", jnp.int8, jnp.int32)
int16 = _q("int16", 16, "int", jnp.int16, jnp.int32)
int32 = _q("int32", 32, "int", jnp.int32, jnp.int64)
int64 = _q("int64", 64, "int", jnp.int64, jnp.int64)

DTYPES: dict[str, QDType] = {
    d.name: d
    for d in (
        f32, f64, bf16,
        uint2, uint4, uint8, uint16, uint32, uint64,
        int4, int8, int16, int32, int64,
    )
}

FLOAT_DTYPES = (f32, f64, bf16)
QUANT_DTYPES = tuple(d for d in DTYPES.values() if d.is_quant)

_JNP_TO_QDTYPE = {
    jnp.dtype(jnp.float32): f32,
    jnp.dtype(jnp.float64): f64,
    jnp.dtype(jnp.bfloat16): bf16,
}


def dtype_of(d) -> QDType:
    """Coerce a name / QDType / jnp float dtype to a registry entry."""
    if isinstance(d, QDType):
        return d
    if isinstance(d, str):
        try:
            return DTYPES[d]
        except KeyError:
            raise ValueError(f"unknown piquant dtype {d!r}; known: {sorted(DTYPES)}") from None
    jd = jnp.dtype(d)
    if jd in _JNP_TO_QDTYPE:
        return _JNP_TO_QDTYPE[jd]
    # Plain integer jnp dtypes share names with quant registry entries.
    if jd.name in DTYPES:
        return DTYPES[jd.name]
    raise ValueError(f"cannot map {d!r} to a piquant dtype")


def packed_numel(numel: int, dt: QDType) -> int:
    """Number of STORAGE elements needed for `numel` logical codes.

    Mirrors the reference `packed_numel` (src/piquant_internal.hpp:41-44):
    sub-byte codes share bytes, everything else is 1:1.
    """
    pf = dt.pack_factor
    return (numel + pf - 1) // pf


def tail_mask(numel: int, dt: QDType) -> Optional[int]:
    """Bit mask for the final storage byte of a packed buffer, or None.

    The reference zeroes the unused high bits of a partially-filled tail byte
    (src/kernels/quantize.inl:67-70, 90-98); this mask selects the valid bits.
    """
    if not dt.is_packed:
        return None
    rem = numel % dt.pack_factor
    if rem == 0:
        return None
    return (1 << (rem * dt.bits)) - 1


def np_storage_dtype(dt: QDType) -> np.dtype:
    return np.dtype(dt.storage.name)
