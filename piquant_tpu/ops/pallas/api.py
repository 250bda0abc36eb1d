"""Pallas kernel front-door: returns None when a combination has no TPU
fast path, in which case dispatch falls back to the jnp reference impl —
the moral equivalent of the reference's SIMD fast-path coverage matrix with
scalar-tail fallback (src/kernels/quantize.inl:110-130, SURVEY §2.1)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from piquant_tpu.dtypes import QDType

Array = jax.Array


def quantize(x, scale, zero_point, dt: QDType, round_mode: str, *, key=None) -> Optional[Array]:
    from piquant_tpu.ops.pallas import quantize as _q

    return _q.quantize(x, scale, zero_point, dt, round_mode, key=key)


def dequantize(q, numel, scale, zero_point, dt: QDType, odt: QDType, reduce_op: str, out) -> Optional[Array]:
    from piquant_tpu.ops.pallas import dequantize as _dq

    return _dq.dequantize(q, numel, scale, zero_point, dt, odt, reduce_op, out)


def requantize(x, scale, zero_point, dt: QDType, round_mode: str, reduce_op: str, out, *, key=None) -> Optional[Array]:
    from piquant_tpu.ops.pallas import requantize as _rq

    return _rq.requantize(x, scale, zero_point, dt, round_mode, reduce_op, out, key=key)


def compute_quant_params(x, dt: QDType) -> Optional[Tuple[Array, Array]]:
    from piquant_tpu.ops.pallas import minmax as _mm

    return _mm.compute_quant_params(x, dt)
