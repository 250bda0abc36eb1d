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


def _quant_block(x, inv_ref, zp_ref, qmin, qmax, stochastic):
    """Shared rounding/clamp step on one block; returns int32 codes.

    Takes 1/scale (not scale): the reciprocal is computed on the host for
    host-supplied scales (reference.inv_scale_f32) because the on-chip f32
    divide is 1 ulp off IEEE, which flips round() at exact half-code
    boundaries (found by the on-chip oracle suite; see inv_scale_f32)."""
    r = x.astype(jnp.float32) * inv_ref[0]
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

    def kern(inv_ref, zp_ref, seed_ref, x_ref, o_ref):
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        codes = _quant_block(x_ref[:], inv_ref, zp_ref, qmin, qmax, stochastic)
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
    # independent blocks: let Mosaic overlap the next block's DMA
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("parallel",)),
    )


@lru_cache(maxsize=None)
def _mxu_pack_kernel(rows: int, in_dtype: str, bits: int, signed: bool,
                     qmin: int, qmax: int, stochastic: bool, block_rows: int):
    """rows x (128*pack) float -> rows x 128 packed bytes via MXU."""
    pack = 8 // bits

    def kern(inv_ref, zp_ref, seed_ref, x_ref, w_ref, o_ref):
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        codes = _quant_block(x_ref[:], inv_ref, zp_ref, qmin, qmax, stochastic)
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
    # independent blocks: let Mosaic overlap the next block's DMA
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("parallel",)),
    )


def quantize(x: Array, scale, zero_point, dt: QDType, round_mode: str,
             *, key: Optional[Array] = None) -> Optional[Array]:
    src = dtype_of(x.dtype)
    if not C.supports_dtype(src.name):
        return None
    if dt.name not in _DIRECT_STORE and dt.name not in ("uint4", "int4", "uint2"):
        return None
    stochastic = round_mode == "stochastic"
    pack = dt.pack_factor
    unit = C.LANES * pack
    n = x.size
    if n == 0:
        return None

    # Pad to a whole kernel unit instead of stitching a jnp tail: padding
    # elements land in discarded bytes (or the masked bits of the final
    # byte), so ONE Pallas program covers every size.  The fused
    # pallas-body + jnp-tail program stalled the remote TPU backend, and
    # a single code path is simpler anyway.
    rows = -(-n // unit)
    padded = rows * unit
    xin = x.reshape(-1)
    if padded != n:
        xin = jnp.concatenate([xin, jnp.zeros((padded - n,), xin.dtype)])

    from piquant_tpu.ops.reference import inv_scale_f32
    inv_a = jnp.asarray(inv_scale_f32(scale), jnp.float32).reshape(1)
    zp_a = jnp.asarray(zero_point, jnp.int32).reshape(1)
    seed_a = C.seed_from_key(key)

    _, br = C.grid_rows(rows, aliased=False, bf16=src.name == "bf16")

    if dt.name in _DIRECT_STORE:
        k = _direct_kernel(rows * pack, src.name, dt.name, dt.qmin, dt.qmax,
                           stochastic, br)
        out = k(inv_a, zp_a, seed_a, xin.reshape(rows, C.LANES)).reshape(-1)
        return out[:n] if padded != n else out
    k = _mxu_pack_kernel(rows, src.name, dt.bits, dt.kind == "int",
                         dt.qmin, dt.qmax, stochastic, br)
    out = k(inv_a, zp_a, seed_a, xin.reshape(rows, unit),
            C.pack_matrix(dt.bits)).reshape(-1)
    pb = packed_numel(n, dt)
    if pb != out.size:
        out = out[:pb]
    tm = tail_mask(n, dt)
    if tm is not None:  # zero the unused bits of the partial final byte
        out = out.at[pb - 1].set(out[pb - 1] & jnp.uint8(tm))
    return out
