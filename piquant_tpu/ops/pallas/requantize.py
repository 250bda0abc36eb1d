"""Pallas fused quantize->dequantize (requantize / fake-quant) kernel.

The reference's requant_generic (kernels.inl:30-52) has NO SIMD fast path —
it always runs scalar.  Here the fused op is a single vectorized pass: no
packing is ever needed (codes never leave registers), so every quant dtype
<= 16 bits is supported in one kernel family.  SET and ADD store operators
(ADD via input_output_aliases).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.dtypes import QDType, dtype_of
from piquant_tpu.ops.pallas import common as C

# independent grid blocks: lets Mosaic overlap the next block's DMA with
# this block's compute instead of serializing grid steps (same win as the
# qmatmul kernels' annotation, r4)
_PAR = pltpu.CompilerParams(dimension_semantics=("parallel",))

Array = jax.Array

_FLOAT = {"f32": jnp.float32, "bf16": jnp.bfloat16}


@lru_cache(maxsize=None)
def _requant_kernel(rows: int, f_dtype: str, qmin: int, qmax: int,
                    stochastic: bool, add: bool, block_rows: int):
    fdt = _FLOAT[f_dtype]

    def body(scale_ref, inv_ref, zp_ref, seed_ref, x_ref):
        # inv = 1/scale arrives precomputed (host-exact when the scale is a
        # host scalar — see reference.inv_scale_f32: the on-chip f32 divide
        # is 1 ulp off IEEE and flips round() at half-code boundaries)
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        r = x_ref[:].astype(jnp.float32) * inv_ref[0]
        if stochastic:
            rounded = jnp.floor(r + C.uniform_from_bits(r.shape))
        else:
            rounded = jnp.trunc(r + jnp.where(r >= 0, 0.5, -0.5))
        codes = jnp.clip(rounded.astype(jnp.int32) + zp_ref[0], qmin, qmax)
        return (codes - zp_ref[0]).astype(jnp.float32) * scale_ref[0]

    def kern_set(scale_ref, inv_ref, zp_ref, seed_ref, x_ref, o_ref):
        o_ref[:] = body(scale_ref, inv_ref, zp_ref, seed_ref, x_ref).astype(fdt)

    def kern_add(scale_ref, inv_ref, zp_ref, seed_ref, x_ref, acc_ref, o_ref):
        v = body(scale_ref, inv_ref, zp_ref, seed_ref, x_ref)
        o_ref[:] = (acc_ref[:].astype(jnp.float32) + v).astype(fdt)

    grid = pl.cdiv(rows, block_rows)
    bspec = lambda: pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    smem = C.scalar_smem_spec
    if not add:
        return pl.pallas_call(
            kern_set,
            out_shape=jax.ShapeDtypeStruct((rows, C.LANES), fdt),
            grid=(grid,),
            in_specs=[smem(), smem(), smem(), smem(), bspec()],
            out_specs=bspec(),
            compiler_params=_PAR,
        )
    return pl.pallas_call(
        kern_add,
        out_shape=jax.ShapeDtypeStruct((rows, C.LANES), fdt),
        grid=(grid,),
        in_specs=[smem(), smem(), smem(), smem(), bspec(), bspec()],
        out_specs=bspec(),
        input_output_aliases={5: 0},
        compiler_params=_PAR,
    )


def requantize(x: Array, scale, zero_point, dt: QDType, round_mode: str,
               reduce_op: str, out: Optional[Array], *,
               key: Optional[Array] = None) -> Optional[Array]:
    src = dtype_of(x.dtype)
    if not C.supports_dtype(src.name) or dt.bits > 16:
        return None
    stochastic = round_mode == "stochastic"
    add = reduce_op == "add"
    n = x.size
    if n == 0:
        return None

    # Pad to whole kernel rows and slice (see quantize.py: the stitched
    # pallas-body + jnp-tail program stalled the remote TPU backend).
    # ADD aliasing needs block-exact rows (common.grid_rows).
    rows = -(-n // C.LANES)
    rows, br = C.grid_rows(rows, aliased=add, bf16=src.name == "bf16")
    padded = rows * C.LANES
    xf = x.reshape(-1)
    if padded != n:
        xf = jnp.concatenate([xf, jnp.zeros((padded - n,), xf.dtype)])

    from piquant_tpu.ops.reference import inv_scale_f32
    scale_a = jnp.asarray(scale, jnp.float32).reshape(1)
    inv_a = jnp.asarray(inv_scale_f32(scale), jnp.float32).reshape(1)
    zp_a = jnp.asarray(zero_point, jnp.int32).reshape(1)
    seed_a = C.seed_from_key(key)

    k = _requant_kernel(rows, src.name, dt.qmin, dt.qmax, stochastic, add, br)
    args = (scale_a, inv_a, zp_a, seed_a, xf.reshape(rows, C.LANES))
    if add:
        acc = out.reshape(-1)
        if acc.size != padded:
            acc = jnp.concatenate([acc, jnp.zeros((padded - acc.size,), acc.dtype)])
        args = args + (acc.reshape(rows, C.LANES),)
    res = k(*args).reshape(-1)
    return res[:n] if padded != n else res
