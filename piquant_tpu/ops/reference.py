"""Pure-jnp reference implementations of every piquant-tpu op.

This is the TPU-build analogue of the reference's in-repo oracle
(test/naive.hpp:52-96) *and* its generic scalar kernels
(src/kernels/quantize.inl:101-149, src/kernels/dequantize.inl:89-140,
src/kernels/kernels.inl:30-52): a single, obviously-correct jnp
implementation of quantize / dequantize / requantize / compute_quant_params
that (a) serves as the test oracle for the Pallas kernels, and (b) is the
fallback compute path on platforms where the Pallas kernels are not used.
XLA fuses these elementwise pipelines well, so this path is also reasonably
fast — the Pallas kernels exist to reach HBM speed-of-light and to fuse into
matmuls/collectives.

Semantics preserved from the reference (see SURVEY.md §5):
  * nearest rounding = round-half-AWAY-from-zero (std::round,
    src/kernels/quantize.inl:23; SIMD paths use x + sign(x)*0.5 → trunc,
    src/kernels/kernels_specialized.inl:66-70 — same function).
  * stochastic rounding: r = x/scale; frac = |r - trunc(r)|;
    step = sign(r) if u < frac else 0; q = trunc(r) + step + zp
    (src/kernels/quantize.inl:9-19).  The reference draws ONE uniform
    threshold per call (src/piquant.cpp:194-201); we upgrade to per-element
    uniforms (strictly better: unbiased), which the reference's own tests
    anticipate by only ever checking a ±1-step tolerance (test/quant.cpp:16).
  * dequant: (int(q) - zp) * scale, with SET or ADD store operator
    (src/kernels/dequantize.inl:8-11,26-38).
  * requantize = dequant(quant(x)) fused, never materializing codes
    (src/kernels/kernels.inl:30-52).
  * scale/zero-point derivation incl. the degenerate rmax==rmin -> (1.0, mid)
    rule and zp clamping (src/piquant.cpp:222-259).
  * packing bit order: see piquant_tpu.dtypes docstring.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from piquant_tpu.dtypes import QDType, dtype_of, packed_numel

__all__ = [
    "round_half_away",
    "pack_codes",
    "unpack_codes",
    "quantize_codes",
    "quantize",
    "dequantize",
    "requantize",
    "compute_quant_params",
]

Array = jax.Array


def round_half_away(x: Array) -> Array:
    """Round half away from zero (ties outward), matching C std::round."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5).astype(x.dtype))


def inv_scale_f32(scale):
    """1/scale in f32, computed on the HOST when `scale` is host-resident.

    Reference parity: the reference derives inv_scale ONCE on the host and
    multiplies in the kernels (src/kernels/quantize.inl:9-23).  A TPU
    in-graph f32 divide is reciprocal-approximation based and can land 1 ulp
    off the IEEE quotient — enough to flip round() at exact half-code
    boundaries (observed on-chip: bf16 x=4.0, scale=8/15 gives r=7.5000005
    vs the IEEE 7.4999995, one code off vs both oracles).  Host-computing
    the reciprocal keeps compiled kernels bit-identical to the oracles for
    host-supplied scales; traced scales (in-jit model/QAT paths) keep the
    device divide, where bit-parity with a host oracle is not a contract.
    """
    import numpy as np

    if isinstance(scale, jax.core.Tracer):
        return jnp.float32(1.0) / scale.astype(jnp.float32)
    if isinstance(scale, jax.Array):
        if scale.size != 1:
            return jnp.float32(1.0) / scale.astype(jnp.float32)
        scale = jax.device_get(scale).reshape(())  # one scalar readback
    return np.float32(np.float32(1.0) / np.float32(scale))


def _check_quant(dt: QDType) -> None:
    if not dt.is_quant:
        raise ValueError(f"destination dtype {dt.name} is not a quantized type")


def _check_float(dt: QDType) -> None:
    if not dt.is_float:
        raise ValueError(f"dtype {dt.name} is not a float type")


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def pack_codes(codes: Array, qdtype: Union[QDType, str]) -> Array:
    """Pack integer codes into the wire format (flat storage array).

    For sub-byte dtypes, codes are packed LSB-first into uint8 bytes; the tail
    byte's unused bits are zero.  For >=8-bit dtypes this is a cast to the
    storage dtype.  `codes` is a flat integer array of logical elements.
    """
    dt = dtype_of(qdtype)
    _check_quant(dt)
    if not dt.is_packed:
        return codes.astype(dt.storage)
    pf = dt.pack_factor
    n = codes.shape[0]
    npad = (-n) % pf
    # Two's-complement truncation to `bits` so signed sub-byte codes pack
    # correctly; zero-pad AFTER masking so tail bits stay zero.
    mask = (1 << dt.bits) - 1
    c = (codes.astype(jnp.uint8) & jnp.uint8(mask))
    if npad:
        c = jnp.concatenate([c, jnp.zeros((npad,), jnp.uint8)])
    c = c.reshape(-1, pf).astype(jnp.uint32)
    packed = c[:, 0]
    for k in range(1, pf):
        packed = packed | (c[:, k] << (k * dt.bits))
    return packed.astype(jnp.uint8)


def unpack_codes(packed: Array, numel: int, qdtype: Union[QDType, str]) -> Array:
    """Inverse of pack_codes: flat storage array -> flat codes (compute dtype).

    Signed sub-byte codes are sign-extended from their `bits`-wide field.
    """
    dt = dtype_of(qdtype)
    _check_quant(dt)
    if not dt.is_packed:
        return packed.astype(dt.compute)
    pf = dt.pack_factor
    shifts = (jnp.arange(pf, dtype=jnp.uint32) * dt.bits)
    mask = jnp.uint32((1 << dt.bits) - 1)
    fields = (packed.astype(jnp.uint32)[:, None] >> shifts[None, :]) & mask
    codes = fields.reshape(-1)[:numel].astype(dt.compute)
    if dt.kind == "int":
        half = 1 << (dt.bits - 1)
        codes = jnp.where(codes >= half, codes - (1 << dt.bits), codes)
    return codes


# ---------------------------------------------------------------------------
# quantize
# ---------------------------------------------------------------------------

def quantize_codes(
    x: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    qdtype: Union[QDType, str],
    round_mode: str = "nearest",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Quantize floats to UNPACKED integer codes (compute dtype).

    The core step shared by quantize/requantize.  Arithmetic runs in f32 for
    <=16-bit inputs (matching the reference, which upcasts bf16 to f32) and in
    the input's own precision for f64.
    """
    dt = dtype_of(qdtype)
    _check_quant(dt)
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    xf = x.astype(acc)
    inv_scale = jnp.asarray(inv_scale_f32(scale), jnp.float32).astype(acc)
    r = xf * inv_scale
    if round_mode == "nearest":
        rounded = round_half_away(r)
    elif round_mode == "stochastic":
        if key is None:
            raise ValueError("stochastic rounding requires a PRNG key")
        u = jax.random.uniform(key, r.shape, dtype=acc)
        frac = jnp.abs(r - jnp.trunc(r))
        step = jnp.where(u < frac, jnp.where(r < 0, -1.0, 1.0), 0.0).astype(acc)
        rounded = jnp.trunc(r) + step
    else:
        raise ValueError(f"unknown round_mode {round_mode!r}")
    zp = jnp.asarray(zero_point)
    if dt.bits <= 16:
        # Exact integer clamp path (reference clamps in int64,
        # src/kernels/quantize.inl:15-18; int32 suffices for <=16-bit codes
        # because |rounded| is clamped right after).
        integral = rounded.astype(jnp.int32) + zp.astype(jnp.int32)
        q = jnp.clip(integral, dt.qmin, dt.qmax)
        return q.astype(dt.compute)
    # Wide types (32/64-bit): exact int64-domain add+clamp, mirroring the
    # reference's static_cast<int64>(rnd) + zp chain (quantize.inl:15-18).
    # The float rounding result is range-limited first so the int cast is
    # defined even for inf/overflow inputs.
    rf = jnp.clip(rounded.astype(jnp.float64), -(2.0 ** 62), 2.0 ** 62)
    integral = rf.astype(jnp.int64) + zp.astype(jnp.int64)
    q = jnp.clip(integral, dt.qmin, dt.qmax)
    return q.astype(dt.compute)


def quantize(
    x: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    qdtype: Union[QDType, str],
    round_mode: str = "nearest",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Quantize a flat float array -> flat packed storage array.

    Reference parity: context::quantize (src/piquant.cpp:277-308) minus the
    byte-size validation, which lives in the API layer.
    """
    dt = dtype_of(qdtype)
    codes = quantize_codes(x.reshape(-1), scale, zero_point, dt, round_mode, key=key)
    return pack_codes(codes, dt)


def _int_domain_diff(codes: Array, zero_point, dt: QDType) -> Array:
    """codes - zp computed exactly in the integer domain (reference
    dequant_step subtracts before the float cast, dequantize.inl:8-11).

    uint64 subtracts with wraparound and reinterprets as int64 two's
    complement — exact as long as |codes - zp| < 2^63.
    """
    zp = jnp.asarray(zero_point)
    if dt.name == "uint64":
        d = codes.astype(jnp.uint64) - zp.astype(jnp.uint64)
        return jax.lax.bitcast_convert_type(d, jnp.int64)
    return codes.astype(jnp.int64) - zp.astype(jnp.int64)


# ---------------------------------------------------------------------------
# dequantize
# ---------------------------------------------------------------------------

def dequantize(
    q: Array,
    numel: int,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    qdtype: Union[QDType, str],
    out_dtype: Union[QDType, str] = "f32",
    reduce_op: str = "set",
    out: Optional[Array] = None,
) -> Array:
    """Dequantize a flat packed array -> flat float array.

    reduce_op='set' returns dq; 'add' returns out + dq (the ring-reduce
    building block, reference src/kernels/dequantize.inl:29-31).
    """
    dt = dtype_of(qdtype)
    odt = dtype_of(out_dtype)
    _check_quant(dt)
    _check_float(odt)
    if reduce_op not in ("set", "add"):
        raise ValueError(f"unknown reduce_op {reduce_op!r}")
    codes = unpack_codes(q.reshape(-1), numel, dt)
    acc = jnp.float64 if odt.name == "f64" else jnp.float32
    # Subtract zp in the INTEGER domain first (reference dequant_step,
    # src/kernels/dequantize.inl:8-11): for 32/64-bit codes the difference is
    # small even when the codes themselves exceed float mantissa range.
    diff = _int_domain_diff(codes, zero_point, dt).astype(acc) if dt.bits > 16 \
        else codes.astype(acc) - jnp.asarray(zero_point).astype(acc)
    dq = diff * jnp.asarray(scale).astype(acc)
    dq = dq.astype(odt.storage)
    if reduce_op == "add":
        if out is None:
            raise ValueError("reduce_op='add' requires an `out` array")
        return out.reshape(-1) + dq
    return dq


# ---------------------------------------------------------------------------
# requantize (fused fake-quant)
# ---------------------------------------------------------------------------

def requantize(
    x: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    qdtype: Union[QDType, str],
    round_mode: str = "nearest",
    reduce_op: str = "set",
    out: Optional[Array] = None,
    *,
    key: Optional[Array] = None,
) -> Array:
    """Fused quantize->dequantize (quantization-error simulation / fake-quant).

    Reference parity: requant_generic (src/kernels/kernels.inl:30-52),
    extended with the Python/C-API exposure the reference lacks (SURVEY §3.4).
    """
    dt = dtype_of(qdtype)
    xf = x.reshape(-1)
    codes = quantize_codes(xf, scale, zero_point, dt, round_mode, key=key)
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    diff = _int_domain_diff(codes, zero_point, dt).astype(acc) if dt.bits > 16 \
        else codes.astype(acc) - jnp.asarray(zero_point).astype(acc)
    dq = (diff * jnp.asarray(scale).astype(acc)).astype(x.dtype)
    if reduce_op == "add":
        if out is None:
            raise ValueError("reduce_op='add' requires an `out` array")
        return out.reshape(-1) + dq
    if reduce_op != "set":
        raise ValueError(f"unknown reduce_op {reduce_op!r}")
    return dq


# ---------------------------------------------------------------------------
# quant-param derivation
# ---------------------------------------------------------------------------

def compute_quant_params(
    x: Array,
    qdtype: Union[QDType, str],
) -> Tuple[Array, Array]:
    """Asymmetric affine (scale, zero_point) from data min/max.

    Matches compute_quant_config (src/piquant.cpp:222-259):
        scale = (rmax - rmin) / (qmax - qmin)
        zp    = clamp(round(qmin - rmin / scale), qmin, qmax)
    with the degenerate rmax == rmin case -> (1.0, (qmax + qmin) >> 1).
    Returns (f32 scale, int32 zero_point) as 0-d arrays.
    """
    dt = dtype_of(qdtype)
    _check_quant(dt)
    xf = x.reshape(-1).astype(jnp.float32)
    rmin = jnp.min(xf)
    rmax = jnp.max(xf)
    qmin, qmax = float(dt.qmin), float(dt.qmax)
    span = rmax - rmin
    scale = span / jnp.float32(qmax - qmin)
    zp = jnp.float32(qmin) - rmin / scale
    zp = jnp.clip(round_half_away(zp), qmin, qmax)
    degenerate = span == 0
    mid = (dt.qmax + dt.qmin) >> 1
    scale = jnp.where(degenerate, jnp.float32(1.0), scale)
    zp = jnp.where(degenerate, jnp.float32(mid), zp)
    return scale.astype(jnp.float32), zp.astype(jnp.int32)
