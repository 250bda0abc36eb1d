"""Pallas single-pass min/max reduction -> (scale, zero_point) derivation.

TPU analogue of the reference's unrolled SIMD find_min_max kernels
(kernels_specialized.inl:1418-1607) + compute_quant_config
(src/piquant.cpp:222-259).  One HBM pass computes BOTH min and max
(XLA's jnp.min/jnp.max would each traverse the tensor); the sequential TPU
grid accumulates partials into an SMEM cell, mirroring the reference's
partial-combine on the caller thread.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.dtypes import QDType, dtype_of
from piquant_tpu.ops.pallas import common as C
from piquant_tpu.ops.reference import round_half_away

Array = jax.Array


@lru_cache(maxsize=None)
def _minmax_kernel(rows: int, f_dtype: str, block_rows: int):
    def kern(x_ref, o_ref):
        i = pl.program_id(0)
        blk = x_ref[:].astype(jnp.float32)
        lo = jnp.min(blk)
        hi = jnp.max(blk)

        @pl.when(i == 0)
        def _():
            o_ref[0, 0] = lo
            o_ref[0, 1] = hi

        @pl.when(i > 0)
        def _():
            o_ref[0, 0] = jnp.minimum(o_ref[0, 0], lo)
            o_ref[0, 1] = jnp.maximum(o_ref[0, 1], hi)

    grid = pl.cdiv(rows, block_rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block_rows, C.LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )


def min_max(x: Array) -> Optional[Tuple[Array, Array]]:
    """Single-pass (min, max) of a float array; None if no fast path."""
    src = dtype_of(x.dtype)
    if not C.supports_dtype(src.name):
        return None
    n = x.size
    if n == 0:
        return None
    # A ragged LAST BLOCK would read padded garbage rows into the reduction,
    # so (unlike the elementwise kernels, whose edge stores are just masked)
    # the main kernel body is an exact multiple of the big block; the
    # remainder goes to a SECOND single-block kernel call padded with its own
    # first element (neutral for both min and max) — every size runs on the
    # kernel, no XLA-side tail reduce.
    br = C.BLOCK_ROWS
    unit = br * C.LANES
    body = (n // unit) * unit
    xf = x.reshape(-1)
    lo = hi = None
    if body:
        rows = body // C.LANES
        mm = _minmax_kernel(rows, src.name, br)(xf[:body].reshape(rows, C.LANES))
        lo, hi = mm[0, 0], mm[0, 1]
    tail = n - body
    if tail:
        quantum = 16 if src.name == "bf16" else 8
        trows = -(-tail // C.LANES)
        trows += (-trows) % quantum
        pad = trows * C.LANES - tail
        tf = xf[body:]
        if pad:
            tf = jnp.concatenate(
                [tf, jnp.broadcast_to(tf[:1], (pad,))])
        mm2 = _minmax_kernel(trows, src.name, trows)(tf.reshape(trows, C.LANES))
        lo = mm2[0, 0] if lo is None else jnp.minimum(lo, mm2[0, 0])
        hi = mm2[0, 1] if hi is None else jnp.maximum(hi, mm2[0, 1])
    return lo, hi


def compute_quant_params(x: Array, dt: QDType) -> Optional[Tuple[Array, Array]]:
    # Ragged grids make the last block re-read edge rows, which is fine for
    # min/max (idempotent) — but the padded garbage rows are NOT fine, so the
    # tail is reduced separately in XLA and combined (mirrors the reference's
    # caller-thread combine, src/piquant.cpp:237-244).
    mm = min_max(x)
    if mm is None:
        return None
    rmin, rmax = mm
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
