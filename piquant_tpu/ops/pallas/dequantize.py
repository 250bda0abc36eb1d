"""Pallas dequantize kernels: packed codes -> float, SET or ADD store.

TPU analogue of the reference's dequant SIMD paths
(kernels_specialized.inl:730-1416).  ADD store (the ring-reduce hook,
dequantize.inl:29-31) is implemented with input_output_aliases so the
accumulator is read-modify-written in one pass.  Sub-byte unpacking
interleaves field planes back to wire order on the MXU.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.dtypes import QDType, dtype_of, packed_numel
from piquant_tpu.ops.pallas import common as C

# independent grid blocks: lets Mosaic overlap the next block's DMA with
# this block's compute instead of serializing grid steps (same win as the
# qmatmul kernels' annotation, r4)
_PAR = pltpu.CompilerParams(dimension_semantics=("parallel",))

Array = jax.Array

_DIRECT_LOAD = {"uint8", "int8", "uint16", "int16"}
_FLOAT_OUT = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def _dq(codes_i32, scale_ref, zp_ref):
    return (codes_i32 - zp_ref[0]).astype(jnp.float32) * scale_ref[0]


@lru_cache(maxsize=None)
def _direct_kernel(rows: int, q_dtype: str, out_dtype: str, add: bool,
                   block_rows: int):
    odt = _FLOAT_OUT[out_dtype]

    def kern_set(scale_ref, zp_ref, q_ref, o_ref):
        codes = q_ref[:].astype(jnp.int32)
        o_ref[:] = _dq(codes, scale_ref, zp_ref).astype(odt)

    def kern_add(scale_ref, zp_ref, q_ref, acc_ref, o_ref):
        codes = q_ref[:].astype(jnp.int32)
        v = _dq(codes, scale_ref, zp_ref)
        o_ref[:] = (acc_ref[:].astype(jnp.float32) + v).astype(odt)

    grid = pl.cdiv(rows, block_rows)
    bspec = lambda: pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    if not add:
        return pl.pallas_call(
            kern_set,
            out_shape=jax.ShapeDtypeStruct((rows, C.LANES), odt),
            grid=(grid,),
            in_specs=[C.scalar_smem_spec(), C.scalar_smem_spec(), bspec()],
            out_specs=bspec(),
            compiler_params=_PAR,
        )
    return pl.pallas_call(
        kern_add,
        out_shape=jax.ShapeDtypeStruct((rows, C.LANES), odt),
        grid=(grid,),
        in_specs=[C.scalar_smem_spec(), C.scalar_smem_spec(), bspec(), bspec()],
        out_specs=bspec(),
        input_output_aliases={3: 0},  # accumulator aliases the output
        compiler_params=_PAR,
    )


@lru_cache(maxsize=None)
def _mxu_unpack_kernel(rows: int, bits: int, signed: bool, out_dtype: str,
                       add: bool, block_rows: int):
    """rows x 128 packed bytes -> rows x (128*pack) floats (wire order)."""
    pack = 8 // bits
    odt = _FLOAT_OUT[out_dtype]
    width = C.LANES * pack
    mask = (1 << bits) - 1
    half = 1 << (bits - 1)

    def planes_to_wide(b_i32, u_ref):
        """Interleave `pack` field planes via the MXU scatter matrices.

        u_ref is the (pack*LANES, width) vertical stack of scatter matrices;
        plane j uses rows [j*LANES, (j+1)*LANES).
        """
        acc = None
        for j in range(pack):
            f = (b_i32 >> (bits * j)) & mask
            if signed:
                f = jnp.where(f >= half, f - (mask + 1), f)
            fb = f.astype(jnp.bfloat16)
            part = jnp.dot(fb, u_ref[j * C.LANES:(j + 1) * C.LANES],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc  # f32 codes in wire order (signed already applied)

    def kern_set(scale_ref, zp_ref, q_ref, u_ref, o_ref):
        codes = planes_to_wide(q_ref[:].astype(jnp.int32), u_ref)
        o_ref[:] = ((codes - zp_ref[0].astype(jnp.float32)) * scale_ref[0]).astype(odt)

    def kern_add(scale_ref, zp_ref, q_ref, u_ref, acc_ref, o_ref):
        codes = planes_to_wide(q_ref[:].astype(jnp.int32), u_ref)
        v = (codes - zp_ref[0].astype(jnp.float32)) * scale_ref[0]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) + v).astype(odt)

    grid = pl.cdiv(rows, block_rows)
    qspec = pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    uspec = pl.BlockSpec((pack * C.LANES, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if not add:
        return pl.pallas_call(
            kern_set,
            out_shape=jax.ShapeDtypeStruct((rows, width), odt),
            grid=(grid,),
            in_specs=[C.scalar_smem_spec(), C.scalar_smem_spec(), qspec, uspec],
            out_specs=ospec,
            compiler_params=_PAR,
        )
    return pl.pallas_call(
        kern_add,
        out_shape=jax.ShapeDtypeStruct((rows, width), odt),
        grid=(grid,),
        in_specs=[C.scalar_smem_spec(), C.scalar_smem_spec(), qspec, uspec, ospec],
        out_specs=ospec,
        input_output_aliases={4: 0},
        compiler_params=_PAR,
    )


def dequantize(q: Array, numel: int, scale, zero_point, dt: QDType, odt: QDType,
               reduce_op: str, out: Optional[Array]) -> Optional[Array]:
    if odt.name not in _FLOAT_OUT:
        return None
    if dt.name not in _DIRECT_LOAD and dt.name not in ("uint4", "int4", "uint2"):
        return None
    add = reduce_op == "add"
    pack = dt.pack_factor
    unit = C.LANES * pack
    if numel == 0:
        return None

    # Pad the packed input (and accumulator) to a whole kernel unit and
    # slice the result — one Pallas program for every size; the stitched
    # pallas-body + jnp-tail program stalled the remote TPU backend (see
    # quantize.py).  Padding bytes dequantize to garbage that is sliced off.
    # ADD (aliased accumulator) cannot use a ragged last grid block — the
    # donated buffer must match the out_shape exactly — so rows round up to
    # a whole block there.
    rows = -(-numel // unit)
    rows, br = C.grid_rows(rows, aliased=add, bf16=odt.name == "bf16")
    padded = rows * unit

    scale_a = jnp.asarray(scale, jnp.float32).reshape(1)
    zp_a = jnp.asarray(zero_point, jnp.int32).reshape(1)
    qf = q.reshape(-1)
    in_elems = rows * C.LANES if dt.is_packed else padded
    if qf.size != in_elems:
        qf = jnp.concatenate([qf, jnp.zeros((in_elems - qf.size,), qf.dtype)])
    acc = None
    if add:
        acc = out.reshape(-1)
        if acc.size != padded:
            acc = jnp.concatenate([acc, jnp.zeros((padded - acc.size,), acc.dtype)])

    if dt.name in _DIRECT_LOAD:
        k = _direct_kernel(rows, dt.name, odt.name, add, br)
        args = (scale_a, zp_a, qf.reshape(rows, C.LANES))
        if add:
            args = args + (acc.reshape(rows, C.LANES),)
        res = k(*args).reshape(-1)
    else:
        k = _mxu_unpack_kernel(rows, dt.bits, dt.kind == "int", odt.name, add, br)
        args = (scale_a, zp_a, qf.reshape(rows, C.LANES),
                C.unpack_matrices(dt.bits))
        if add:
            args = args + (acc.reshape(rows, unit),)
        res = k(*args).reshape(-1)
    return res[:numel] if padded != numel else res
