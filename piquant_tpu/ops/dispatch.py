"""Op dispatch: route each (op, src, dst, round, reduce) to the best impl.

TPU-native replacement for the reference's constexpr function-pointer tables +
cpuid registry (src/kernels/kernels.inl:56-196, src/piquant.cpp:24-81,178-188):
here "dispatch" is a trace-time decision — on TPU the hot combinations lower
to Pallas kernels; everywhere else (and for long-tail combinations) the jnp
reference implementation runs, which XLA fuses into near-optimal elementwise
pipelines on its own.  `jit` specialization replaces the per-ISA kernel
clones: every distinct (shapes, dtypes, modes) combination compiles once.

Set PIQUANT_TPU_FORCE_REF=1 to force the jnp path (useful for A/B tests).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from piquant_tpu.dtypes import QDType
from piquant_tpu.ops import reference as _ref

Array = jax.Array


def _use_pallas() -> bool:
    if os.environ.get("PIQUANT_TPU_FORCE_REF", "0") == "1":
        return False
    return jax.default_backend() == "tpu"


def _pallas_ops():
    # Imported lazily so CPU-only environments never touch pallas.
    from piquant_tpu.ops.pallas import api as _pk

    return _pk


# ---------------------------------------------------------------------------

def quantize(
    x: Array,
    scale,
    zero_point,
    dt: QDType,
    round_mode: str,
    *,
    key: Optional[Array] = None,
) -> Array:
    if _use_pallas():
        pk = _pallas_ops()
        out = pk.quantize(x, scale, zero_point, dt, round_mode, key=key)
        if out is not None:
            return out
    return _ref.quantize(x, scale, zero_point, dt, round_mode, key=key)


def dequantize(
    q: Array,
    numel: int,
    scale,
    zero_point,
    dt: QDType,
    odt: QDType,
    reduce_op: str,
    out: Optional[Array],
) -> Array:
    if _use_pallas():
        pk = _pallas_ops()
        res = pk.dequantize(q, numel, scale, zero_point, dt, odt, reduce_op, out)
        if res is not None:
            return res
    return _ref.dequantize(q, numel, scale, zero_point, dt, odt, reduce_op, out)


def requantize(
    x: Array,
    scale,
    zero_point,
    dt: QDType,
    round_mode: str,
    reduce_op: str,
    out: Optional[Array],
    *,
    key: Optional[Array] = None,
) -> Array:
    if _use_pallas():
        pk = _pallas_ops()
        res = pk.requantize(x, scale, zero_point, dt, round_mode, reduce_op, out, key=key)
        if res is not None:
            return res
    return _ref.requantize(x, scale, zero_point, dt, round_mode, reduce_op, out, key=key)


def compute_quant_params(x: Array, dt: QDType) -> Tuple[Array, Array]:
    if _use_pallas():
        pk = _pallas_ops()
        res = pk.compute_quant_params(x, dt)
        if res is not None:
            return res
    return _ref.compute_quant_params(x, dt)
