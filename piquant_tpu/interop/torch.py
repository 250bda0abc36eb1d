"""PyTorch adapter — drop-in for the reference's `piquant.torch` module
(python/src/piquant/torch.py:9-129): same function names, kwargs and dtype
mapping (torch.quint2x4 / quint4x2 / quint8 / uint8 / float32 / bfloat16),
same packed wire layout, so `import piquant_tpu.interop.torch as piquant_torch`
is a 1:1 port target for reference users.

Runs on the native host runtime (csrc) when available — torch tensors live on
host, so this is the fast path — falling back to the jnp reference impl.
"""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

try:
    import torch
except ImportError as _e:  # pragma: no cover
    raise ImportError("piquant_tpu.interop.torch requires torch") from _e

from piquant_tpu.dtypes import DTYPES, packed_numel
from piquant_tpu.runtime import host_available

_TORCH_TO_PQ = {
    torch.float32: "f32",
    torch.float64: "f64",
    torch.bfloat16: "bf16",
    torch.quint2x4: "uint2",
    torch.quint4x2: "uint4",
    torch.quint8: "uint8",
    torch.uint8: "uint8",
    torch.int8: "int8",
    torch.int16: "int16",
    torch.int32: "int32",
    torch.int64: "int64",
}

_QUANT_TYPES = {torch.quint2x4, torch.quint4x2, torch.quint8, torch.uint8,
                torch.int8, torch.int16, torch.int32, torch.int64}
_DEQUANT_TYPES = {torch.float32, torch.float64, torch.bfloat16}


def torch_to_piquant_dtype(dtype: torch.dtype) -> str:
    if dtype not in _TORCH_TO_PQ:
        raise ValueError(f"Unsupported dtype: {dtype}")
    return _TORCH_TO_PQ[dtype]


def piquant_to_torch_dtype(name: str):
    for td, pd in _TORCH_TO_PQ.items():
        if pd == name:
            return td
    raise ValueError(f"Unsupported piquant dtype: {name}")


def _tensor_to_numpy(t: torch.Tensor) -> np.ndarray:
    t = t.contiguous()
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def _host_ctx():
    if not host_available():
        return None
    from piquant_tpu.runtime import HostContext

    if not hasattr(_host_ctx, "_ctx"):
        _host_ctx._ctx = HostContext()
    return _host_ctx._ctx


def _jnp_fallback():
    import jax.numpy as jnp

    from piquant_tpu.ops import reference as ref

    return jnp, ref


def compute_quant_params(tensor: torch.Tensor, *, dtype: torch.dtype) -> Tuple[float, int]:
    """Derive (scale, zero_point); reference python/src/piquant/torch.py:53-67."""
    assert dtype in _QUANT_TYPES, f"Unsupported quantized dtype: {dtype}"
    x = _tensor_to_numpy(tensor)
    qname = torch_to_piquant_dtype(dtype)
    ctx = _host_ctx()
    if ctx is not None:
        return ctx.compute_quant_params(x, qname)
    jnp, ref = _jnp_fallback()
    s, z = ref.compute_quant_params(jnp.asarray(np.asarray(x, np.float32)), DTYPES[qname])
    return float(s), int(z)


def quantize(
    tensor: torch.Tensor,
    *,
    scale: float,
    zero_point: int,
    dtype: torch.dtype,
    round_mode: str = "nearest",
    seed: int = 0,
) -> torch.Tensor:
    """Quantize a float tensor to a (possibly sub-byte packed) torch tensor.

    Reference parity: python/src/piquant/torch.py:70-99 — output is
    torch.empty(shape, dtype=quint*) filled with the packed wire bytes.
    """
    assert dtype in _QUANT_TYPES, f"Unsupported quantized dtype: {dtype}"
    if tensor.dtype not in _DEQUANT_TYPES:
        raise ValueError(f"Input must be float, got {tensor.dtype}")
    x = _tensor_to_numpy(tensor)
    qname = torch_to_piquant_dtype(dtype)
    ctx = _host_ctx()
    if ctx is not None:
        packed = ctx.quantize(x, scale, zero_point, qname, round_mode, seed=seed)
    else:
        import jax

        jnp, ref = _jnp_fallback()
        key = jax.random.key(seed) if round_mode == "stochastic" else None
        packed = np.asarray(
            ref.quantize(jnp.asarray(x.astype(np.float32)), scale, zero_point,
                         DTYPES[qname], round_mode, key=key)
        )
    out = torch.empty(tensor.shape, dtype=dtype)
    nbytes = packed.nbytes
    cap = out.element_size() * out.numel()
    if nbytes > cap:
        raise ValueError(
            f"packed payload ({nbytes} B) exceeds the torch {dtype} buffer "
            f"({cap} B) — packed-layout mismatch for shape {tuple(tensor.shape)}")
    ctypes.memmove(out.data_ptr(), packed.ctypes.data, nbytes)
    return out


def dequantize(
    tensor: torch.Tensor,
    *,
    scale: float,
    zero_point: int,
    dtype: torch.dtype,
    reduce_op: str = "set",
    out: torch.Tensor | None = None,
) -> torch.Tensor:
    """Dequantize a packed torch tensor back to float32/bfloat16.

    Reference parity: python/src/piquant/torch.py:102-129 (+ the ADD reduce
    op accumulating into `out`, which the reference exposes via prefilled
    output buffers).
    """
    if dtype not in _DEQUANT_TYPES:
        raise ValueError(f"Unsupported dequantized dtype: {dtype}")
    qname = torch_to_piquant_dtype(tensor.dtype)
    qdt = DTYPES[qname]
    if not qdt.is_quant:
        raise ValueError(f"Input must be a quantized tensor, got {tensor.dtype}")
    numel = tensor.numel()
    tensor = tensor.contiguous()
    pb = packed_numel(numel, qdt) * qdt.stride
    raw = np.empty(pb, np.uint8)
    ctypes.memmove(raw.ctypes.data, tensor.data_ptr(), pb)
    packed = raw.view({1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[qdt.stride])
    if qdt.kind == "int" and qdt.bits >= 8:
        packed = packed.view({1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[qdt.stride])

    out_name = torch_to_piquant_dtype(dtype)
    ctx = _host_ctx()
    base_np = None
    if out is not None:
        base_np = _tensor_to_numpy(out).reshape(-1).copy()
    if ctx is not None:
        res = ctx.dequantize(packed, numel, scale, zero_point, qname,
                             out_dtype=out_name, reduce_op=reduce_op, out=base_np)
    else:
        import jax.numpy as jnp

        _, ref = _jnp_fallback()
        base = None if base_np is None else jnp.asarray(base_np.astype(np.float32))
        res = np.asarray(
            ref.dequantize(jnp.asarray(packed), numel, scale, zero_point, qdt,
                           DTYPES[out_name], reduce_op, base)
        )
    t = torch.empty(tensor.shape, dtype=dtype)
    res = np.ascontiguousarray(res)
    ctypes.memmove(t.data_ptr(), res.ctypes.data, t.element_size() * t.numel())
    return t
