"""Independent numpy oracle for the test suite.

The reference validates its production kernels against a naive scalar
reimplementation living in the tests (test/naive.hpp:52-96); this module
plays the same role for piquant-tpu.  It deliberately shares NO code with
piquant_tpu.ops — straight numpy, element-at-a-time semantics.

Numerics mirror the reference scalar kernels:
  * multiply by inv_scale = 1/scale computed in f32 (src/kernels/quantize.inl:134)
  * nearest = round-half-away-from-zero (std::round)
  * clamp to [qmin, qmax] after adding the zero point
  * dequant = (code - zp) * scale in f32
"""

from __future__ import annotations

import numpy as np


def np_round_half_away(r: np.ndarray) -> np.ndarray:
    return np.trunc(r + np.copysign(np.array(0.5, r.dtype), r))


def np_quantize_codes(x, scale, zp, qmin, qmax, acc=np.float32):
    """Float array -> integer codes, nearest rounding.

    `acc` is the accumulation dtype (f32 like the reference, f64 for f64
    inputs, matching piquant_tpu.ops.reference.quantize_codes).
    """
    inv = np.float32(1.0) / np.float32(scale)
    r = x.astype(acc) * acc(inv)
    v = np_round_half_away(r)
    if qmax > 2**53:  # wide types: float64-domain clamp (impl parity)
        v = v.astype(np.float64) + np.float64(zp)
        return np.clip(v, np.float64(qmin), np.float64(qmax))
    v = v.astype(np.int64) + np.int64(zp)
    return np.clip(v, qmin, qmax)


def np_pack(codes: np.ndarray, bits: int) -> np.ndarray:
    """LSB-first sub-byte packing (reference quantize.inl:37-50)."""
    if bits == 8:
        return codes.astype(np.uint8)
    pf = 8 // bits
    mask = (1 << bits) - 1
    c = (codes.astype(np.int64) & mask).astype(np.uint8)
    pad = (-len(c)) % pf
    if pad:
        c = np.concatenate([c, np.zeros(pad, np.uint8)])
    c = c.reshape(-1, pf)
    out = np.zeros(len(c), np.uint8)
    for k in range(pf):
        out |= c[:, k] << (k * bits)
    return out


def np_unpack(packed: np.ndarray, numel: int, bits: int, signed: bool = False) -> np.ndarray:
    if bits == 8:
        codes = packed.astype(np.int64)
    else:
        pf = 8 // bits
        mask = (1 << bits) - 1
        fields = np.stack(
            [(packed.astype(np.int64) >> (k * bits)) & mask for k in range(pf)], axis=1
        )
        codes = fields.reshape(-1)[:numel]
    if signed:
        half = 1 << (bits - 1)
        codes = np.where(codes >= half, codes - (1 << bits), codes)
    return codes


def np_dequant(codes, scale, zp, dtype=np.float32):
    return ((codes.astype(np.float64) - np.float64(zp)) * np.float64(np.float32(scale))).astype(
        np.float32
    ).astype(dtype)


def np_quant_params(x, qmin, qmax):
    """Reference compute_quant_config math (src/piquant.cpp:222-259)."""
    rmin = float(np.min(x.astype(np.float32)))
    rmax = float(np.max(x.astype(np.float32)))
    if rmax == rmin:
        return 1.0, (qmax + qmin) >> 1
    scale = np.float32((np.float32(rmax) - np.float32(rmin)) / np.float32(qmax - qmin))
    zp = np.float32(qmin) - np.float32(rmin) / scale
    zp = int(np.clip(np_round_half_away(np.float64(zp)), qmin, qmax))
    return float(scale), zp
