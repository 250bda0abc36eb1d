"""Public functional API of piquant-tpu.

TPU-native re-design of the reference's `piquant::context` surface
(include/piquant.hpp:199-339, src/piquant.cpp:277-381) and its Python mirror
(python/src/piquant/__init__.py:20-142): a context-FREE functional API —
on TPU there is no thread pool to own, `jit` replaces per-call scheduling and
the Pallas grid replaces work partitioning — plus a thin `Context` shim for
drop-in parity with the reference's Python package.

Validation contract (reference parity, src/piquant.cpp:277-369):
  * quantize: input must be a float dtype, target a quant dtype.
  * dequantize: packed input size must be EXACTLY packed_numel(numel, dt).
  * requantize: input/output element counts equal (same array here).
All checks raise ValueError at trace time (the reference `panic()`s at
runtime, src/piquant.cpp:88-98).
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from piquant_tpu import dtypes as _dt
from piquant_tpu.dtypes import QDType, dtype_of, packed_numel
from piquant_tpu.ops import dispatch as _ops

__all__ = [
    "RoundMode",
    "ReduceOp",
    "QuantizedTensor",
    "quantize",
    "dequantize",
    "requantize",
    "quantize_dequantize_fused",
    "compute_quant_params",
    "quantize_tensor",
    "dequantize_tensor",
    "Context",
]

Array = jax.Array


class RoundMode(str, enum.Enum):
    """Mirror of the reference round_mode enum (include/piquant.hpp:22-27)."""

    NEAREST = "nearest"
    STOCHASTIC = "stochastic"


class ReduceOp(str, enum.Enum):
    """Mirror of the reference reduce_op enum (include/piquant.hpp:29-34)."""

    SET = "set"
    ADD = "add"


def _round_mode(rm: Union[str, RoundMode]) -> str:
    rm = RoundMode(rm)
    return rm.value


def _reduce_op(op: Union[str, ReduceOp]) -> str:
    op = ReduceOp(op)
    return op.value


def _as_float_input(x: Array) -> QDType:
    dt = dtype_of(x.dtype)
    if not dt.is_float:
        raise ValueError(
            f"quantize input must be f32/f64/bf16, got {x.dtype} "
            "(reference asserts the same direction, src/piquant.cpp:283-288)"
        )
    return dt


# ---------------------------------------------------------------------------
# flat functional API (reference `context` methods)
# ---------------------------------------------------------------------------

def quantize(
    x: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    dtype: Union[QDType, str],
    round_mode: Union[str, RoundMode] = "nearest",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Quantize a float array to a packed flat storage array.

    For sub-byte dtypes the result is a flat uint8 buffer of
    `packed_numel(x.size, dtype)` bytes in the wire layout; otherwise the
    result keeps `x.shape` in the storage dtype.
    """
    _as_float_input(x)
    dt = dtype_of(dtype)
    if not dt.is_quant:
        raise ValueError(f"quantize target must be a quant dtype, got {dt.name}")
    rm = _round_mode(round_mode)
    if rm == "stochastic" and key is None:
        raise ValueError("stochastic rounding requires key=jax.random.key(...)")
    out = _ops.quantize(x.reshape(-1), scale, zero_point, dt, rm, key=key)
    if not dt.is_packed:
        out = out.reshape(x.shape)
    return out


def dequantize(
    q: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    dtype: Union[QDType, str],
    *,
    out_dtype: Union[QDType, str] = "f32",
    numel: Optional[int] = None,
    reduce_op: Union[str, ReduceOp] = "set",
    out: Optional[Array] = None,
    shape: Optional[Tuple[int, ...]] = None,
) -> Array:
    """Dequantize a packed flat array back to floats.

    `dtype` is the QUANT dtype of `q` (packed buffers are untyped uint8, so it
    cannot be inferred).  For packed dtypes `numel` gives the logical element
    count (defaults to the maximum the buffer can hold).  reduce_op='add'
    accumulates into `out` (reference src/kernels/dequantize.inl:29-31).
    """
    dt = dtype_of(dtype)
    if not dt.is_quant:
        raise ValueError(f"dequantize source must be a quant dtype, got {dt.name}")
    if jnp.issubdtype(jnp.asarray(q).dtype, jnp.inexact):
        raise ValueError(
            f"dequantize input must hold integer codes, got {q.dtype} "
            "(the reference direction contract, src/piquant.cpp:323-327)")
    odt = dtype_of(out_dtype)
    if not odt.is_float:
        raise ValueError(f"dequantize output must be a float dtype, got {odt.name}")
    op = _reduce_op(reduce_op)
    if numel is None:
        numel = out.size if out is not None else q.size * dt.pack_factor
    if packed_numel(numel, dt) != q.size:
        raise ValueError(
            f"packed buffer has {q.size} storage elements but numel={numel} "
            f"{dt.name} codes need exactly {packed_numel(numel, dt)} "
            "(reference exact-size contract, src/piquant.cpp:323-327)"
        )
    if op == "add":
        if out is None:
            raise ValueError("reduce_op='add' requires out=<accumulator array>")
        if out.size != numel:
            raise ValueError(f"out.size={out.size} != numel={numel}")
    res = _ops.dequantize(q.reshape(-1), numel, scale, zero_point, dt, odt, op, out)
    if shape is not None:
        res = res.reshape(shape)
    elif out is not None:
        res = res.reshape(out.shape)
    return res


def requantize(
    x: Array,
    scale: Union[float, Array],
    zero_point: Union[int, Array],
    dtype: Union[QDType, str],
    round_mode: Union[str, RoundMode] = "nearest",
    *,
    reduce_op: Union[str, ReduceOp] = "set",
    out: Optional[Array] = None,
    key: Optional[Array] = None,
) -> Array:
    """Fused quantize->dequantize (fake-quant); shape-preserving.

    Reference: context::quantize_dequantize_fused (src/piquant.cpp:342-369),
    which is C++-only there — exposed first-class here (SURVEY §3.4 gap).
    """
    _as_float_input(x)
    dt = dtype_of(dtype)
    rm = _round_mode(round_mode)
    op = _reduce_op(reduce_op)
    if rm == "stochastic" and key is None:
        raise ValueError("stochastic rounding requires key=jax.random.key(...)")
    if op == "add" and out is None:
        raise ValueError("reduce_op='add' requires out=<accumulator array>")
    if out is not None and out.size != x.size:
        raise ValueError("requantize requires out.size == x.size (src/piquant.cpp:355)")
    res = _ops.requantize(x.reshape(-1), scale, zero_point, dt, rm, op, out, key=key)
    return res.reshape(x.shape)


# Alias with the reference's C++ method name.
quantize_dequantize_fused = requantize


def compute_quant_params(
    x: Array,
    dtype: Union[QDType, str],
) -> Tuple[Array, Array]:
    """Derive (scale, zero_point) from data min/max for an affine mapping.

    Reference: context::compute_quant_config_from_data (src/piquant.cpp:371-381).
    Returns 0-d arrays (f32, int32) — jit-friendly; call .item() for scalars.
    """
    _as_float_input(x)
    dt = dtype_of(dtype)
    if not dt.is_quant:
        raise ValueError(f"target must be a quant dtype, got {dt.name}")
    return _ops.compute_quant_params(x.reshape(-1), dt)


# ---------------------------------------------------------------------------
# QuantizedTensor — shape-carrying convenience wrapper
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """A packed quantized tensor with its affine parameters.

    The reference has no such type (its API is pointer+numel); on TPU a pytree
    wrapper lets quantized tensors flow through jit/shard_map/optimizers.
    `data` is the flat packed storage buffer; `shape` the logical shape.
    """

    data: Array
    scale: Array
    zero_point: Array
    qdtype: str
    shape: Tuple[int, ...]

    @property
    def dtype_info(self) -> QDType:
        return dtype_of(self.qdtype)

    @property
    def numel(self) -> int:
        n = 1
        for s in self.shape:
            n *= s
        return n

    def dequantize(
        self,
        out_dtype: Union[QDType, str] = "f32",
        *,
        reduce_op: Union[str, ReduceOp] = "set",
        out: Optional[Array] = None,
    ) -> Array:
        res = dequantize(
            self.data, self.scale, self.zero_point, self.qdtype,
            out_dtype=out_dtype, numel=self.numel, reduce_op=reduce_op, out=out,
        )
        return res.reshape(self.shape)

    def tree_flatten(self):
        return (self.data, self.scale, self.zero_point), (self.qdtype, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zp = children
        qdtype, shape = aux
        return cls(data, scale, zp, qdtype, shape)


def quantize_tensor(
    x: Array,
    dtype: Union[QDType, str],
    round_mode: Union[str, RoundMode] = "nearest",
    *,
    scale: Optional[Union[float, Array]] = None,
    zero_point: Optional[Union[int, Array]] = None,
    key: Optional[Array] = None,
) -> QuantizedTensor:
    """One-call quantization: derive params (unless given) and pack."""
    dt = dtype_of(dtype)
    if scale is None or zero_point is None:
        scale, zero_point = compute_quant_params(x, dt)
    data = quantize(x, scale, zero_point, dt, round_mode, key=key)
    return QuantizedTensor(
        data=data.reshape(-1),
        scale=jnp.asarray(scale, jnp.float32),
        zero_point=jnp.asarray(zero_point, jnp.int32),
        qdtype=dt.name,
        shape=tuple(x.shape),
    )


def dequantize_tensor(
    qt: QuantizedTensor,
    out_dtype: Union[QDType, str] = "f32",
) -> Array:
    return qt.dequantize(out_dtype)


# ---------------------------------------------------------------------------
# Context shim (reference-parity surface)
# ---------------------------------------------------------------------------

class Context:
    """Drop-in analogue of `piquant.Context` (python/src/piquant/__init__.py:64-142).

    On TPU there is no thread pool to configure — XLA owns scheduling — so the
    constructor arguments are accepted and ignored; the methods forward to the
    functional API.  Exists so reference users can port call sites 1:1.
    """

    _singleton: Optional["Context"] = None

    def __init__(self, num_threads: Optional[int] = None) -> None:
        del num_threads  # no host thread pool on TPU; kept for API parity

    @classmethod
    def get(cls) -> "Context":
        if cls._singleton is None:
            cls._singleton = cls()
        return cls._singleton

    quantize = staticmethod(quantize)
    dequantize = staticmethod(dequantize)
    quantize_dequantize_fused = staticmethod(requantize)
    compute_quant_params = staticmethod(compute_quant_params)
    compute_quant_config_from_data = staticmethod(compute_quant_params)
