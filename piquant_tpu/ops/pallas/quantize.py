"""Pallas quantize kernels: float (f32/bf16) -> packed quant codes.

The TPU analogue of the reference's SIMD quantize fast paths
(kernels_specialized.inl:35-728) with two structural upgrades:
  * packing for sub-byte dtypes runs on the MXU (constant selection matrix,
    byte-exact wire ABI) instead of in-register shuffles;
  * stochastic rounding uses the per-core hardware PRNG with per-element
    uniforms (reference draws ONE threshold per call, src/piquant.cpp:194-201).

Fast-path coverage: src f32/bf16; dst uint8/int8/uint16/int16 (direct store)
and uint4/int4/uint2 (MXU pack); nearest + stochastic.  Everything else
returns None -> jnp fallback (the "scalar tail" of this framework).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.dtypes import QDType, dtype_of, packed_numel, tail_mask
from piquant_tpu.ops.pallas import common as C

Array = jax.Array

_DIRECT_STORE = {"uint8": jnp.uint8, "int8": jnp.int8,
                 "uint16": jnp.uint16, "int16": jnp.int16}


def _quant_block(x, scale_ref, zp_ref, qmin, qmax, stochastic):
    """Shared rounding/clamp step on one block; returns int32 codes."""
    inv = 1.0 / scale_ref[0]
    r = x.astype(jnp.float32) * inv
    if stochastic:
        u = C.uniform_from_bits(r.shape)
        rounded = jnp.floor(r + u)
    else:
        rounded = jnp.trunc(r + jnp.where(r >= 0, 0.5, -0.5))
    return jnp.clip(rounded.astype(jnp.int32) + zp_ref[0], qmin, qmax)


@lru_cache(maxsize=None)
def _direct_kernel(rows: int, in_dtype: str, out_dtype: str, qmin: int, qmax: int,
                   stochastic: bool, block_rows: int):
    """rows x 128 float -> rows x 128 storage codes (no packing)."""
    odt = _DIRECT_STORE[out_dtype]

    def kern(scale_ref, zp_ref, seed_ref, x_ref, o_ref):
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        codes = _quant_block(x_ref[:], scale_ref, zp_ref, qmin, qmax, stochastic)
        if out_dtype in ("uint16", "int16"):
            o_ref[:] = codes.astype(odt)
        else:
            o_ref[:] = codes.astype(odt)

    grid = pl.cdiv(rows, block_rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, C.LANES), odt),
        grid=(grid,),
        in_specs=[
            C.scalar_smem_spec(), C.scalar_smem_spec(), C.scalar_smem_spec(),
            pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )


@lru_cache(maxsize=None)
def _mxu_pack_kernel(rows: int, in_dtype: str, bits: int, signed: bool,
                     qmin: int, qmax: int, stochastic: bool, block_rows: int):
    """rows x (128*pack) float -> rows x 128 packed bytes via MXU."""
    pack = 8 // bits

    def kern(scale_ref, zp_ref, seed_ref, x_ref, w_ref, o_ref):
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        codes = _quant_block(x_ref[:], scale_ref, zp_ref, qmin, qmax, stochastic)
        if signed:
            codes = codes & ((1 << bits) - 1)  # two's-complement field
        cb = codes.astype(jnp.bfloat16)
        packed = jnp.dot(cb, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = packed.astype(jnp.int32).astype(jnp.uint8)

    grid = pl.cdiv(rows, block_rows)
    width = C.LANES * pack
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, C.LANES), jnp.uint8),
        grid=(grid,),
        in_specs=[
            C.scalar_smem_spec(), C.scalar_smem_spec(), C.scalar_smem_spec(),
            pl.BlockSpec((block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((width, C.LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )


def quantize(x: Array, scale, zero_point, dt: QDType, round_mode: str,
             *, key: Optional[Array] = None) -> Optional[Array]:
    src = dtype_of(x.dtype)
    if not C.supports_dtype(src.name):
        return None
    stochastic = round_mode == "stochastic"
    pack = dt.pack_factor
    unit = C.LANES * pack
    body, tail = C.split_tail(x.size, pack)
    if body == 0:
        return None

    scale_a = jnp.asarray(scale, jnp.float32).reshape(1)
    zp_a = jnp.asarray(zero_point, jnp.int32).reshape(1)
    seed_a = C.seed_from_key(key)

    xin = x.reshape(-1)
    xb = xin[:body]
    rows = body // unit
    br = min(C.BLOCK_ROWS, max(8, rows - rows % 8 or 8))
    if src.name == "bf16":
        br = max(16, br - br % 16)

    if dt.name in _DIRECT_STORE:
        k = _direct_kernel(rows * pack, src.name, dt.name, dt.qmin, dt.qmax,
                           stochastic, br)
        out_body = k(scale_a, zp_a, seed_a, xb.reshape(rows, C.LANES)).reshape(-1)
    elif dt.name in ("uint4", "int4", "uint2"):
        k = _mxu_pack_kernel(rows, src.name, dt.bits, dt.kind == "int",
                             dt.qmin, dt.qmax, stochastic, br)
        out_body = k(scale_a, zp_a, seed_a, xb.reshape(rows, unit),
                     C.pack_matrix(dt.bits)).reshape(-1)
    else:
        return None

    if tail == 0:
        return out_body

    from piquant_tpu.ops import reference as _ref

    tkey = None
    if stochastic:
        tkey = jax.random.fold_in(key, 0x7A11)
    tail_out = _ref.quantize(xin[body:], scale, zero_point, dt, round_mode, key=tkey)
    return jnp.concatenate([out_body, tail_out.astype(out_body.dtype)])
