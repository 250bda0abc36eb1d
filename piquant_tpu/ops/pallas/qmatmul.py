"""Fused dequant+matmul Pallas kernel (weight-only INT4/INT8).

The BASELINE north star: "fused dequant+matmul in VMEM ... drive each kernel
to HBM speed-of-light".  Weights stay PACKED in HBM; each grid step streams
one packed block into VMEM, expands it in-register, and feeds the MXU —
the float weight matrix never exists in memory.

INT4 uses the split-half layout (quant/linear.py): byte row k holds code
rows k and k + K/2, so expansion is two elementwise ops and the matmul
identity  x @ W = x[:, :K/2] @ deq(lo) + x[:, K/2:] @ deq(hi)  — no lane
shuffles.  The affine zero-point folds analytically:
    x @ ((c - zp) * s) = (x @ c) * s - (x @ 1) * (zp * s)
so the kernel computes raw-code matmuls in bf16 (codes <= 255 are exact)
with f32 accumulation and applies the per-channel correction at the end.

Decode shapes (M <= 32): x fits VMEM whole, grid runs over N only; weight
traffic K*N/2 bytes is the wall — arithmetic intensity 4*M flops/byte keeps
the MXU fed without ever being compute-bound.  Larger M adds an M grid axis.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BN_CANDIDATES = (1024, 512, 256, 128)  # larger N tiles = fewer grid steps /
# bigger DMAs; measured on v5e (M=16, K=4096, N=14336, median of 3):
# bn=128: 352 GB/s | 256: 482 | 512: 561 | 1024: 929 (weight-stream)
W_BLOCK_VMEM_LIMIT = 2 * 1024 * 1024   # packed-block byte cap: the unpack
# temporaries (i32 + bf16 planes) cost ~6x the packed block in SCOPED vmem,
# whose default limit is 16 MB — 7168x1024 bytes measured 44 MB scoped (OOM)
M_MAX = 64        # beyond this the XLA path wins (prefill is compute-bound,
                  # and keeping full-K x blocks double-buffered in VMEM stops
                  # paying off — measured OOM at M=8192, K=14336)
XK_VMEM_LIMIT = 4 * 1024 * 1024  # x block ceiling (x2 for double buffering)


@lru_cache(maxsize=None)
def _w4_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str,
               vmem_mb: int = 0):
    """vmem_mb > 0 raises Mosaic's scoped-VMEM ceiling (default 16 MB) so
    large-K weights can keep a single full-K block at bn=512/1024 instead
    of the K-split kernel — the unpack temporaries cost ~6x the packed
    block, which is what the default limit actually caps (v5e has 128 MB
    of physical VMEM).  A/B knob: PIQUANT_W4_BIGBLOCK."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2

    def kern(x_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        lo = (b & 15).astype(jnp.bfloat16)
        hi = (b >> 4).astype(jnp.bfloat16)  # b < 256: no mask needed
        x = x_ref[:]
        acc = jnp.dot(x[:, :kh], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, kh:], hi, preferred_element_type=jnp.float32)
        # xsum and zp*scale are precomputed outside (xsum was a K-length
        # reduction redundantly redone for every N tile)
        o_ref[:] = (acc * s_ref[:] - xsum_ref[:] * zs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        # both grid dims are independent (no cross-step accumulation):
        # telling Mosaic lets it overlap the next tile's weight DMA with
        # this tile's unpack+dot instead of serializing grid steps
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            **({"vmem_limit_bytes": vmem_mb << 20} if vmem_mb else {})),
    )


@lru_cache(maxsize=None)
def _wq_ragged_kernel(m: int, k: int, n: int, e: int, bm: int, bn: int,
                      bits: int, out_dtype: str):
    """Megablocks-style grouped GEMM over a channelwise expert stack
    (INT4 split-half, INT2 split-quarter, or INT8).

    x rows are pre-sorted by expert and padded so every bm-row block belongs
    to exactly ONE expert; the prefetched `block_expert` array drives the
    weight/scale index_maps, so each grid step DMAs only its expert's packed
    tile (quant/moe.py builds the routing).  Same plane unpack and
    analytic zero-point fold as `_w4_kernel`/`_w2_kernel`/`_w8_kernel`."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    rows = {2: k // 4, 4: k // 2}.get(bits, k)

    def kern(be_ref, x_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        del be_ref  # consumed by the index_maps
        b = b_ref[0].astype(jnp.int32)            # (rows, bn)
        x = x_ref[:]
        if bits == 8:
            acc = jnp.dot(x, b.astype(jnp.bfloat16),  # codes < 256: exact
                          preferred_element_type=jnp.float32)
        elif bits == 4:
            kh = k // 2
            acc = jnp.dot(x[:, :kh], (b & 15).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(x[:, kh:], (b >> 4).astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            kq = k // 4
            acc = jnp.dot(x[:, :kq], (b & 3).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            for p in range(1, 4):
                acc += jnp.dot(x[:, p * kq:(p + 1) * kq],
                               ((b >> (2 * p)) & 3).astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[0] - xsum_ref[:] * zs_ref[0]).astype(odt)

    # Grid order (j, i): row blocks iterate FASTEST.  Rows are sorted by
    # expert, so be[i] is non-decreasing and Pallas elides the weight-tile
    # DMA across consecutive same-expert blocks — each expert's (kh, bn)
    # tile streams ONCE per n-tile, total weight traffic = the stack once.
    # ((i, j) order re-fetched the tile every step: measured 32 ms/layer vs
    # 34 dense at Mixtral geometry, i.e. no win at all.)
    grid = (n // bn, m // bm)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda j, i, be: (i, 0)),
                pl.BlockSpec((1, rows, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((bm, 1), lambda j, i, be: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i, be: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
    )


@lru_cache(maxsize=None)
def _wq_ragged_grouped_kernel(m: int, k: int, n: int, e: int, g: int,
                              bm: int, bn: int, bits: int, out_dtype: str):
    """Grouped-scale variant of `_wq_ragged_kernel` (DeepSeek/Mixtral-g32
    MoE prefill).  The per-group zero-point no longer folds into one rank-1
    correction, so dequantize in-register to bf16 (the `_w4_grouped_kernel`
    W4A16 numerics: codes are exact in bf16, the scale multiply rounds once)
    and run one plain dot per plane.  Prefill is MXU-bound at these M, so
    the in-register expand is hidden behind the dots.  Plane p covers code
    rows [p*K/planes, (p+1)*K/planes) — the natural split-half/quarter
    order — so its groups are the contiguous slice [p*g/planes, ...)."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    planes = {2: 4, 4: 2, 8: 1}[bits]
    mask = (1 << bits) - 1
    rp = k // planes          # code rows per plane == packed byte rows
    gp = g // planes          # groups per plane
    gs = k // g

    def kern(be_ref, x_ref, b_ref, s_ref, z_ref, o_ref):
        del be_ref  # consumed by the index_maps
        b = b_ref[0].astype(jnp.int32)            # (rp, bn)
        x = x_ref[:]
        s = s_ref[0]                              # (g, bn) f32
        z = z_ref[0]

        def expand(a):  # (gp, bn) -> (rp, bn): repeat each group row gs x
            return jnp.broadcast_to(a[:, None, :], (gp, gs, bn)).reshape(rp, bn)

        acc = jnp.zeros((x.shape[0], bn), jnp.float32)
        for p in range(planes):
            codes = ((b >> (bits * p)) & mask).astype(jnp.bfloat16)
            sg = expand(s[p * gp:(p + 1) * gp].astype(jnp.bfloat16))
            zg = expand(z[p * gp:(p + 1) * gp].astype(jnp.bfloat16))
            acc += jnp.dot(x[:, p * rp:(p + 1) * rp], (codes - zg) * sg,
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(odt)

    # (j, i) grid order: same DMA-elision rationale as _wq_ragged_kernel
    grid = (n // bn, m // bm)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda j, i, be: (i, 0)),
                pl.BlockSpec((1, rp, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, g, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, g, bn), lambda j, i, be: (be[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i, be: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
    )


def wq_ragged_matmul(x_sorted: Array, stack, block_expert: Array,
                     out_dtype=jnp.bfloat16) -> Optional[Array]:
    """x_sorted [M, K] @ per-block expert of `stack` -> [M, N].

    M must be a multiple of the routing block (block_expert.shape[0] * bm
    == M).  Channelwise or grouped INT2/INT4/INT8 expert stacks."""
    if stack.bits not in (2, 4, 8):
        return None
    if stack.group_size is not None:
        return _wq_ragged_grouped(x_sorted, stack, block_expert, out_dtype)
    m, k = x_sorted.shape
    e, rows, n = stack.data.shape
    if m % block_expert.shape[0]:
        return None
    bm = m // block_expert.shape[0]
    # packed tile capped at 1 MB: the unpack temporaries (~6x) must leave
    # room for double-buffered x blocks, or the weight stream serializes
    bn = next((c for c in BN_CANDIDATES
               if n % c == 0 and rows * c <= W_BLOCK_VMEM_LIMIT // 2), None)
    if bn is None or rows != {2: k // 4, 4: k // 2}.get(stack.bits, k):
        return None
    scale = stack.scale.astype(jnp.float32).reshape(e, 1, n)
    zs = (stack.zero_point.astype(jnp.float32)
          * stack.scale.astype(jnp.float32)).reshape(e, 1, n)
    xb = x_sorted.astype(jnp.bfloat16)
    xsum = jnp.sum(x_sorted.astype(jnp.float32), axis=-1, keepdims=True)
    kern = _wq_ragged_kernel(m, k, n, e, bm, bn, stack.bits,
                             "bf16" if out_dtype == jnp.bfloat16 else "f32")
    return kern(block_expert.astype(jnp.int32),
                xb, stack.data.reshape(e, rows, n), scale, zs, xsum)


@lru_cache(maxsize=None)
def _wq_ragged_a8_kernel(m: int, k: int, n: int, e: int, bm: int, bn: int,
                         bits: int, out_dtype: str):
    """W4A8/W2A8 ragged MoE kernel: int8 per-token activations against
    int8-unpacked sub-byte planes, exact int32 MXU accumulation — the
    1.85x-MXU-rate act-quant path (`_w4a8_kernel`) for expert stacks.
    Channelwise only: the zero-point folds analytically in the INT domain,
        xq @ ((c - zp) * s) * xs = ((xq @ c) - zp * sum(xq)) * s * xs.
    Codes <= 15 fit int8 exactly (bits 2/4; int8 stacks would overflow)."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    planes = {2: 4, 4: 2}[bits]
    mask = (1 << bits) - 1
    rp = k // planes

    def kern(be_ref, xq_ref, xs_ref, xsum_ref, b_ref, s_ref, zs_ref, o_ref):
        del be_ref
        b = b_ref[0].astype(jnp.int32)            # (rp, bn)
        xq = xq_ref[:]
        acc = jnp.zeros((xq.shape[0], bn), jnp.int32)
        for p in range(planes):
            plane = ((b >> (bits * p)) & mask).astype(jnp.int8)
            acc += jax.lax.dot_general(
                xq[:, p * rp:(p + 1) * rp], plane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * s_ref[0]
             - xsum_ref[:] * zs_ref[0]) * xs_ref[:]
        o_ref[:] = y.astype(odt)

    grid = (n // bn, m // bm)   # (j, i): same DMA-elision rationale
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda j, i, be: (i, 0)),
                pl.BlockSpec((bm, 1), lambda j, i, be: (i, 0)),
                pl.BlockSpec((bm, 1), lambda j, i, be: (i, 0)),
                pl.BlockSpec((1, rp, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, i, be: (be[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, i, be: (be[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i, be: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
    )


def wq_ragged_matmul_a8(xq: Array, xs: Array, stack, block_expert: Array,
                        out_dtype=jnp.bfloat16) -> Optional[Array]:
    """Act-quant ragged expert matmul: xq [M, K] int8, xs [M, 1] f32
    per-token scales, channelwise INT2/INT4 stack.  None if unsupported."""
    if stack.bits not in (2, 4) or stack.group_size is not None:
        return None
    m, k = xq.shape
    e, rows, n = stack.data.shape
    planes = {2: 4, 4: 2}[stack.bits]
    if m % block_expert.shape[0] or rows != k // planes:
        return None
    bm = m // block_expert.shape[0]
    bn = next((c for c in BN_CANDIDATES
               if n % c == 0 and rows * c <= W_BLOCK_VMEM_LIMIT // 2), None)
    if bn is None:
        return None
    scale = stack.scale.astype(jnp.float32).reshape(e, 1, n)
    zs = (stack.zero_point.astype(jnp.float32)
          * stack.scale.astype(jnp.float32)).reshape(e, 1, n)
    xsum = jnp.sum(xq.astype(jnp.float32), axis=-1, keepdims=True)
    kern = _wq_ragged_a8_kernel(
        m, k, n, e, bm, bn, stack.bits,
        "bf16" if out_dtype == jnp.bfloat16 else "f32")
    return kern(block_expert.astype(jnp.int32), xq,
                xs.astype(jnp.float32), xsum,
                stack.data.reshape(e, rows, n), scale, zs)


def _wq_ragged_grouped(x_sorted: Array, stack, block_expert: Array,
                       out_dtype) -> Optional[Array]:
    m, k = x_sorted.shape
    e, rows, n = stack.data.shape
    gs = stack.group_size
    planes = {2: 4, 4: 2, 8: 1}[stack.bits]
    g = k // gs
    if (m % block_expert.shape[0] or k % gs
            or (k // planes) % gs            # groups straddle a plane edge
            or stack.scale.shape != (e, g, n)
            or rows != k // planes):
        return None
    bm = m // block_expert.shape[0]
    # per grid step: packed (rows, bn) + two f32 (g, bn) side blocks; keep
    # the combined weight-side block under the same cap as the channelwise
    # path so double-buffered x still fits scoped VMEM
    bn = next((c for c in BN_CANDIDATES
               if n % c == 0
               and (rows + 8 * g) * c <= W_BLOCK_VMEM_LIMIT), None)
    if bn is None:
        return None
    scale = stack.scale.astype(jnp.float32)
    zp = stack.zero_point.astype(jnp.float32)
    kern = _wq_ragged_grouped_kernel(
        m, k, n, e, g, bm, bn, stack.bits,
        "bf16" if out_dtype == jnp.bfloat16 else "f32")
    return kern(block_expert.astype(jnp.int32),
                x_sorted.astype(jnp.bfloat16), stack.data, scale, zp)


# back-compat name (the kernel grew INT2/INT8 support)
w4_ragged_matmul = wq_ragged_matmul


@lru_cache(maxsize=None)
def _w4_kernel_ksplit(m: int, k: int, n: int, bm: int, bn: int, bkh: int,
                      out_dtype: str):
    """K-split variant for large-K weights (w2: K=14336): a third grid axis
    streams (bkh, bn) packed blocks and accumulates in f32 VMEM scratch, so
    bn can stay large (big DMAs) without blowing the scoped-VMEM budget.
    x is passed pre-split into lo/hi halves (a BlockSpec cannot fetch two
    disjoint K-slices of one array)."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2
    nk = kh // bkh

    def kern(xlo_ref, xhi_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref,
             acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = b_ref[:].astype(jnp.int32)
        lo = (b & 15).astype(jnp.bfloat16)
        hi = (b >> 4).astype(jnp.bfloat16)  # b < 256: no mask needed
        acc_ref[:] += (
            jnp.dot(xlo_ref[:], lo, preferred_element_type=jnp.float32)
            + jnp.dot(xhi_ref[:], hi, preferred_element_type=jnp.float32))

        @pl.when(ki == nk - 1)
        def _():
            o_ref[:] = (acc_ref[:] * s_ref[:]
                        - xsum_ref[:] * zs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn, nk)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkh, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        # i/j independent; only the K axis accumulates — declaring it lets
        # Mosaic overlap the next K-block's weight DMA with this block's
        # unpack+dot (the same win measured on the single-K kernel)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )


@lru_cache(maxsize=None)
def _w4a8_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str):
    """Activation-quantized (W4A8) matmul for LARGE M (prefill): int8
    activations feed the MXU at 2x the bf16 rate (measured 346 TFLOP/s vs
    187 for the bf16 paths at M=4096 — 88% of v5e int8 peak) and integer
    arithmetic is exact; the only approximation is the per-token activation
    quantization done by the caller.

    y = xs_row * s_col * (acc - z_col * sum_k xq)  with acc = xq @ codes."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2

    def kern(xq_ref, xs_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        lo = (b & 15).astype(jnp.int8)
        hi = (b >> 4).astype(jnp.int8)
        xq = xq_ref[:]
        acc = jax.lax.dot_general(xq[:, :kh], lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(xq[:, kh:], hi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        corr = acc.astype(jnp.float32) * s_ref[:] - xsum_ref[:] * zs_ref[:]
        o_ref[:] = (corr * xs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )


@lru_cache(maxsize=None)
def _w4a8_kernel_ksplit(m: int, k: int, n: int, bm: int, bn: int, bkh: int,
                        out_dtype: str):
    """K-split W4A8 (large-K weights crash Mosaic in the single-K form)."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2
    nk = kh // bkh

    def kern(xlo_ref, xhi_ref, xs_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref,
             acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        b = b_ref[:].astype(jnp.int32)
        lo = (b & 15).astype(jnp.int8)
        hi = (b >> 4).astype(jnp.int8)
        acc_ref[:] += (
            jax.lax.dot_general(xlo_ref[:], lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            + jax.lax.dot_general(xhi_ref[:], hi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32))

        @pl.when(ki == nk - 1)
        def _():
            corr = (acc_ref[:].astype(jnp.float32) * s_ref[:]
                    - xsum_ref[:] * zs_ref[:])
            o_ref[:] = (corr * xs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn, nk)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bkh), lambda i, j, ki: (i, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkh, bn), lambda i, j, ki: (ki, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )


def w4a8_matmul(xq: Array, xs: Array, ql, out_dtype=jnp.bfloat16) -> Optional[Array]:
    """Pre-quantized activations xq [M, K] int8 + per-row scales xs [M, 1]
    against an int4 channelwise weight; None if no fast path."""
    k, n = ql.k, ql.n
    if ql.bits != 4:
        return None
    if getattr(ql, "group_size", None) is not None:
        m = xq.shape[0]
        mp = m + (-m % 32)          # int8 sublane quantum
        if mp > M_MAX:
            return None             # prefill-sized grouped: dequant+dense
        if mp != m:
            xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
            xs = jnp.pad(xs, ((0, mp - m), (0, 0)))
        y = wg_grouped_matmul(xq, ql, mp, out_dtype,
                              xs=xs.astype(jnp.float32))
        return None if y is None else y[:m]
    if n % 256 or k % 512:
        return None
    m = xq.shape[0]
    kh = k // 2
    bn = next((c for c in (512, 256)
               if n % c == 0 and kh * c <= W_BLOCK_VMEM_LIMIT), None)
    if bn is None:
        return None
    # bigger M tiles amortize the per-M-tile weight re-fetch; large-K
    # weights keep bm small (the xq block must fit VMEM double-buffered)
    bm = 512 if (k <= 4096 and m >= 512) else 256
    mp = m + (-m % bm)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        xs = jnp.pad(xs, ((0, mp - m), (0, 0)))
    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    scale = ql.scale.astype(jnp.float32).reshape(1, n)
    zs = (ql.zero_point.astype(jnp.float32) * ql.scale.astype(jnp.float32)
          ).reshape(1, n)
    xsum = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
    if k > 8192:  # single-K form crashes Mosaic at w2-scale K
        bkh = next((c for c in range(2048, 255, -128) if kh % c == 0), None)
        if bkh is None:
            return None
        kfun = _w4a8_kernel_ksplit(mp, k, n, bm, bn, bkh, oname)
        y = kfun(xq[:, :kh], xq[:, kh:], xs.astype(jnp.float32), ql.data,
                 scale, zs, xsum)
        return y[:m] if mp != m else y
    kfun = _w4a8_kernel(mp, k, n, bm, bn, oname)
    y = kfun(xq, xs.astype(jnp.float32), ql.data, scale, zs, xsum)
    return y[:m] if mp != m else y


@lru_cache(maxsize=None)
def _w8a8_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str):
    """W8A8: int8 activations x int8 weight codes with exact i32
    accumulation (the INT8-weight counterpart of `_w4a8_kernel` — 2x the
    bf16 MXU rate at prefill).  Codes are stored unsigned (0..255), so the
    kernel shifts them to int8 as cs = cu - 128 and the caller folds the
    shift into the zero-point term:
        x @ (cu - zp) s = (x @ cs) s - (sum x) (zp - 128) s."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32

    def kern(xq_ref, xs_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        cs = (b_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jax.lax.dot_general(xq_ref[:], cs, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        corr = acc.astype(jnp.float32) * s_ref[:] - xsum_ref[:] * zs_ref[:]
        o_ref[:] = (corr * xs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )


def w8a8_matmul(xq: Array, xs: Array, ql, out_dtype=jnp.bfloat16
                ) -> Optional[Array]:
    """INT8-weight x int8-activation matmul (channelwise scales); None if
    no fast path (grouped INT8, odd shapes, or K beyond the single-block
    VMEM budget — the caller falls back to weight-only/XLA)."""
    k, n = ql.k, ql.n
    if ql.group_size is not None or n % 128 or k % 256 or k > 8192:
        return None
    m = xq.shape[0]
    bn = next((c for c in (512, 256)
               if n % c == 0 and k * c <= 2 * W_BLOCK_VMEM_LIMIT), None)
    if bn is None:
        return None
    bm = 512 if (k <= 4096 and m >= 512) else 256
    mp = m + (-m % bm)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        xs = jnp.pad(xs, ((0, mp - m), (0, 0)))
    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    s = ql.scale.astype(jnp.float32).reshape(1, n)
    zs = (ql.zero_point.astype(jnp.float32) - 128.0) * s
    xsum = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
    kfun = _w8a8_kernel(mp, k, n, bm, bn, oname)
    y = kfun(xq, xs.astype(jnp.float32), ql.data, s, zs, xsum)
    return y[:m] if mp != m else y


@lru_cache(maxsize=None)
def _w4_grouped_kernel(m: int, k: int, n: int, g: int, bm: int, bn: int,
                       out_dtype: str):
    """Group-wise scales (G groups along K): the zero-point no longer folds
    into one rank-1 correction, so dequantize in-register to bf16 (the
    standard W4A16 numerics) and run two plain dots.  Group boundaries must
    not straddle the split-half plane boundary: (K/2) % group_size == 0."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2
    g2 = g // 2
    gs = k // g

    def expand(a):  # (g2, bn) -> (kh, bn), repeat each group row gs times
        return jnp.broadcast_to(a[:, None, :], (g2, gs, a.shape[-1])
                                ).reshape(kh, a.shape[-1])

    def kern(x_ref, b_ref, s_ref, z_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        lo = (b & 15).astype(jnp.bfloat16)
        hi = (b >> 4).astype(jnp.bfloat16)  # b < 256: no mask needed
        s = s_ref[:].astype(jnp.bfloat16)   # (g, bn)
        z = z_ref[:].astype(jnp.bfloat16)
        w_lo = (lo - expand(z[:g2])) * expand(s[:g2])
        w_hi = (hi - expand(z[g2:])) * expand(s[g2:])
        x = x_ref[:]
        acc = jnp.dot(x[:, :kh], w_lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, kh:], w_hi, preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )


@lru_cache(maxsize=None)
def _wg_chunk_kernel(mp: int, k: int, n: int, gs: int, ch: int, bn: int,
                     bits: int, xdt: str, out_dtype: str):
    """Grouped sub-byte chunk-grid kernel (INT2 split-quarter: 4 planes;
    INT4 split-half: 2 planes).  Grouped INT2 is the quality-viable INT2
    config — channelwise INT2 is unusable, see benchmarks/ppl_quality.py.

    Per-group MXU dots with POST-DOT rescale, instead of pre-scaling whole
    bf16 planes: grid axis c streams chunks of ch*gs packed rows (= 4*ch
    complete groups, ch per bit-plane; storage is the NATURAL split-quarter
    layout), every group contributes one (mp, gs)@(gs, bn) dot, and its
    f32 partial is scaled by that group's scale row.  f32 VMEM scratch
    accumulates across chunks (the _w4_kernel_ksplit pattern).  This kills
    the two limiters of the previous strided-layout kernel (187 GB/s):
    the full-plane `pb * sE` bf16 multiply, and the f32 (G, N) side
    streams.  Side streams ride chunk-major at 3 B per group entry:
    bf16 scales + RAW int8 zero-points, with the fold term z*s computed
    in-register per chunk from the same bf16 scale the code dots use
    (z is exact, so fold error tracks scale rounding — strictly better
    than a pre-multiplied bf16 zp*scale stream, and 25% less side
    traffic than bf16 zs + f32-free for INT4 too).

    xdt='i8' is the W2A8-g fast path: int8 x chunks against int8-unpacked
    planes with exact i32 accumulation (per-group int accumulation, f32
    rescale).  The zero-point fold y -= xgc @ (z*s) accumulates per chunk
    as one (mp, cp)@(cp, bn) f32 dot.  Zero-point/scale math cites
    reference quantize.inl:27-35 / dequantize.inl:22-28."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    planes = {2: 4, 4: 2}[bits]
    mask = (1 << bits) - 1
    g = k // gs
    gp = g // planes
    nc = gp // ch
    rows = ch * gs
    cp = planes * ch          # groups per chunk

    def kern(x3_ref, b_ref, s_ref, z_ref, xgc_ref, xs_ref, o_ref, acc_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        local = jnp.zeros((mp, bn), jnp.float32)
        for t in range(ch):
            bt = b_ref[t * gs:(t + 1) * gs, :].astype(jnp.int32)
            for p in range(planes):
                if xdt == "i8":
                    plane = ((bt >> (bits * p)) & mask).astype(jnp.int8)
                    part = jax.lax.dot_general(
                        x3_ref[p * ch + t], plane, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                else:
                    plane = ((bt >> (bits * p)) & mask).astype(jnp.bfloat16)
                    part = jax.lax.dot_general(
                        x3_ref[p * ch + t], plane, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                st = s_ref[p * ch + t, :].astype(jnp.float32)[None, :]
                local = local + part * st
        # per-chunk zero-point fold: exact int z times the SAME bf16 scale
        # the code dots above were scaled by
        zs = (z_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32))
        local = local - jax.lax.dot_general(
            xgc_ref[0], zs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] += local

        @pl.when(c == nc - 1)
        def _():
            o_ref[:] = (acc_ref[:] * xs_ref[:]).astype(odt)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((mp, n), odt),
        grid=(n // bn, nc),
        in_specs=[
            pl.BlockSpec((cp, mp, gs), lambda j, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, bn), lambda j, c: (c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, bn), lambda j, c: (c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, bn), lambda j, c: (c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, cp), lambda j, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, 1), lambda j, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda j, c: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
    )


def _wg_prep(x2: Array, mp: int, k: int, gs: int, ch: int, planes: int):
    """Chunk-major x pages + chunk-paged per-group sums for the kernel."""
    from piquant_tpu.quant.linear import grouped_chunk_perm

    g = k // gs
    cp = planes * ch
    perm = jnp.asarray(grouped_chunk_perm(k, gs, ch, planes))
    x3 = x2.reshape(mp, g, gs).transpose(1, 0, 2)[perm]
    xg = jnp.sum(x2.astype(jnp.float32).reshape(mp, g, gs), axis=2)
    # chunk-paged group sums: page c holds the cp groups chunk c folds
    xgc = xg[:, perm].reshape(mp, g // cp, cp).transpose(1, 0, 2)
    return x3, xgc


def wg_grouped_matmul(x2: Array, ql, mp: int, out_dtype=jnp.bfloat16,
                      xs: Optional[Array] = None) -> Optional[Array]:
    """Grouped INT2/INT4 matmul via the chunk-grid kernel.

    x2 [mp, K] padded to mp rows: bf16 (weight-only) or int8 with per-row
    scales `xs` [mp, 1] (W2A8-g / W4A8-g).  Requires ql.s_chunk
    (natural-layout grouped weight with cached side streams); None if
    unsupported."""
    from piquant_tpu.quant.linear import grouped_chunk_factor

    k, n, gs = ql.k, ql.n, ql.group_size
    planes = {2: 4, 4: 2}[ql.bits]
    ch = grouped_chunk_factor(k, gs, planes)
    # gs % 32: the in-kernel plane slices b_ref[t*gs:(t+1)*gs] must land on
    # the uint8 sublane quantum
    if (ch is None or gs % 32 or getattr(ql, "s_chunk", None) is None
            or n % 128):
        return None
    bn = next((c for c in BN_CANDIDATES if n % c == 0), None)
    if bn is None:
        return None
    xdt = "i8" if x2.dtype == jnp.int8 else "bf16"
    x3, xgc = _wg_prep(x2, mp, k, gs, ch, planes)
    if xs is None:
        xs = jnp.ones((mp, 1), jnp.float32)
    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    kfun = _wg_chunk_kernel(mp, k, n, gs, ch, bn, ql.bits, xdt, oname)
    return kfun(x3, ql.data, ql.s_chunk, ql.z_chunk, xgc, xs)


def _lut_decode(c, codebook: str):
    """int32 codes in [0, 15] -> bf16 codebook values, as a 15-deep
    vectorized select chain (VPU-friendly; Pallas TPU has no gather).
    bf16 rounding of the irrational NF4 entries is a <=0.4% rel
    perturbation — same W-A16 numerics as the grouped affine kernel's
    bf16 scale multiply.

    The chain selects in f32 and casts to bf16 ONCE at the end: an i1
    mask from an i32 compare carries (8,128) tiling, and Mosaic cannot
    relayout it onto a (16,128) bf16 select destination ("Non-singleton
    logical dimension is replicated in destination but not in source",
    observed on chip); f32 shares the i32 tiling so the selects lower
    cleanly.  Values are identical: bf16(lut[i]) == bf16(f32 select)."""
    from piquant_tpu.quant.linear import CODEBOOKS

    lut = CODEBOOKS[codebook]
    v = jnp.full(c.shape, lut[-1], jnp.float32)
    for i in range(len(lut) - 2, -1, -1):
        v = jnp.where(c == i, jnp.float32(lut[i]), v)
    return v.astype(jnp.bfloat16)


@lru_cache(maxsize=None)
def _nf4_kernel(m: int, k: int, n: int, g: int, bm: int, bn: int,
                codebook: str, out_dtype: str):
    """Fused LUT-dequant + matmul for codebook (NF4) weights.

    Same packed split-half stream as `_w4_kernel`, but the code planes go
    through the 16-entry codebook instead of an affine map.  Channelwise
    (g == 0) applies the absmax scale POST-dot (x @ (v * s_n) =
    (x @ v) * s_n — one rank-1 rescale, codes ride the MXU raw);
    group-wise pre-scales the bf16 value planes like `_w4_grouped_kernel`.
    No zero-point fold exists for a non-uniform grid (the codebook is not
    an affine function of the code), hence the separate kernel."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2

    def kern_chan(x_ref, b_ref, s_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        lo = _lut_decode(b & 15, codebook)
        hi = _lut_decode(b >> 4, codebook)
        x = x_ref[:]
        acc = jnp.dot(x[:, :kh], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, kh:], hi, preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:]).astype(odt)

    def kern_grouped(x_ref, b_ref, s_ref, o_ref):
        g2 = g // 2
        gs = k // g

        def expand(a):  # (g2, bn) -> (kh, bn)
            return jnp.broadcast_to(a[:, None, :], (g2, gs, a.shape[-1])
                                    ).reshape(kh, a.shape[-1])

        b = b_ref[:].astype(jnp.int32)
        s = s_ref[:].astype(jnp.bfloat16)
        w_lo = _lut_decode(b & 15, codebook) * expand(s[:g2])
        w_hi = _lut_decode(b >> 4, codebook) * expand(s[g2:])
        x = x_ref[:]
        acc = jnp.dot(x[:, :kh], w_lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, kh:], w_hi, preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern_grouped if g else kern_chan,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(g, 1), bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )


def nf4_matmul(x: Array, ql, out_dtype=jnp.bfloat16) -> Optional[Array]:
    """x [..., K] @ NF4-packed weight -> [..., N]; None if no fast path
    (caller falls back to the XLA LUT path)."""
    k, n = ql.k, ql.n
    if n % 128 or k % 256:
        return None
    if ql.group_size is not None:
        if (k // 2) % ql.group_size or ql.group_size % 8:
            return None
    bn = next((c for c in BN_CANDIDATES
               if n % c == 0 and (k // 2) * c <= W_BLOCK_VMEM_LIMIT), None)
    if bn is None:
        return None
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    if m > M_MAX:
        return None
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    bm = max(16, m + (-m % 16))
    if bm * k * 2 > XK_VMEM_LIMIT:
        return None
    mp = m + (-m % bm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    oname = ("bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
             else "f32")
    g = (k // ql.group_size) if ql.group_size is not None else 0
    scale = (ql.scale.astype(jnp.float32) if g
             else jnp.broadcast_to(
                 ql.scale.astype(jnp.float32).reshape(1, -1), (1, n)))
    kfun = _nf4_kernel(mp, k, n, g, bm, bn, ql.codebook, oname)
    y = kfun(x2, ql.data, scale)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(out_dtype)


@lru_cache(maxsize=None)
def _w2_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str):
    """INT2 split-quarter (quant/linear.py pack_split_quarter): four 2-bit
    planes per byte, four elementwise unpacks + four dots.  Weight traffic
    is K*N/4 bytes — half of int4."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kq = k // 4

    def kern(x_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        x = x_ref[:]
        acc = jnp.dot(x[:, :kq], (b & 3).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, kq:2 * kq], ((b >> 2) & 3).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, 2 * kq:3 * kq], ((b >> 4) & 3).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, 3 * kq:], (b >> 6).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:] - xsum_ref[:] * zs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kq, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )


@lru_cache(maxsize=None)
def _w2a8_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str):
    """W2A8: int8 activations against int8-unpacked 2-bit planes.  The int8
    MXU dots and 1-byte plane temporaries relieve both INT2 bottlenecks
    (bf16-plane VMEM pressure and bf16 dot structure): measured 710 GB/s
    weight-stream vs 380 for the bf16 single-K kernel on the 8B w1/w3
    decode shape.  y = xs_row * (scale_col * acc - xsum * zp*scale)."""
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kq = k // 4

    def kern(xq_ref, xs_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        b = b_ref[:].astype(jnp.int32)
        xq = xq_ref[:]
        dot = lambda a, w: jax.lax.dot_general(  # noqa: E731
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = dot(xq[:, :kq], (b & 3).astype(jnp.int8))
        acc += dot(xq[:, kq:2 * kq], ((b >> 2) & 3).astype(jnp.int8))
        acc += dot(xq[:, 2 * kq:3 * kq], ((b >> 4) & 3).astype(jnp.int8))
        acc += dot(xq[:, 3 * kq:], (b >> 6).astype(jnp.int8))
        corr = acc.astype(jnp.float32) * s_ref[:] - xsum_ref[:] * zs_ref[:]
        o_ref[:] = (corr * xs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kq, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )


def w2a8_matmul(xq: Array, xs: Array, ql, out_dtype=jnp.bfloat16) -> Optional[Array]:
    """Pre-quantized activations xq [M, K] int8 + per-row scales xs [M, 1]
    against an int2 weight (channelwise, or grouped via the chunk-grid
    W2A8-g kernel); None if no fast path."""
    k, n = ql.k, ql.n
    if ql.bits != 2:
        return None
    if getattr(ql, "group_size", None) is not None:
        m = xq.shape[0]
        mp = m + (-m % 32)          # int8 sublane quantum
        if mp > M_MAX:
            return None
        if mp != m:
            xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
            xs = jnp.pad(xs, ((0, mp - m), (0, 0)))
        y = wg_grouped_matmul(xq, ql, mp, out_dtype,
                              xs=xs.astype(jnp.float32))
        return None if y is None else y[:m]
    if n % 128 or k % 512:
        return None
    kq = k // 4
    m = xq.shape[0]
    bm = max(32, min(512, m + (-m % 32)))  # int8 sublane quantum = 32;
    while bm > 32 and bm * k > XK_VMEM_LIMIT:  # bm>512 crashes Mosaic
        bm //= 2
    if bm * k > XK_VMEM_LIMIT:
        return None
    # prefill-sized M tiles add bm*k xq + bm*bn acc to the scoped-VMEM
    # budget; shrink the packed block (i32+planes temporaries are ~9x its
    # bytes) to stay under the 16 MB limit (measured 20.6M OOM at
    # bm=512, kq*bn=2MB)
    limit = W_BLOCK_VMEM_LIMIT if bm <= 32 else W_BLOCK_VMEM_LIMIT // 4
    bn = next((c for c in (2048,) + BN_CANDIDATES
               if n % c == 0 and kq * c <= limit), None)
    if bn is None:
        return None
    mp = m + (-m % bm)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        xs = jnp.pad(xs, ((0, mp - m), (0, 0)))
    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    scale = ql.scale.astype(jnp.float32).reshape(1, n)
    zs = (ql.zero_point.astype(jnp.float32) * ql.scale.astype(jnp.float32)
          ).reshape(1, n)
    xsum = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
    kfun = _w2a8_kernel(mp, k, n, bm, bn, oname)
    y = kfun(xq, xs.astype(jnp.float32), ql.data, scale, zs, xsum)
    return y[:m] if mp != m else y


@lru_cache(maxsize=None)
def _w8_kernel(m: int, k: int, n: int, bm: int, bn: int, out_dtype: str):
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32

    def kern(x_ref, b_ref, s_ref, zs_ref, xsum_ref, o_ref):
        codes = b_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        x = x_ref[:]
        acc = jnp.dot(x, codes, preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:] - xsum_ref[:] * zs_ref[:]).astype(odt)

    grid = (pl.cdiv(m, bm), n // bn)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )


def quantized_matmul(x: Array, ql, out_dtype=jnp.bfloat16) -> Optional[Array]:
    """x [..., K] @ packed weight -> [..., N]; None if no fast path."""
    if getattr(ql, "codebook", None) is not None:
        return nf4_matmul(x, ql, out_dtype)
    k, n = ql.k, ql.n
    group_size = getattr(ql, "group_size", None)
    if group_size is not None:
        # group boundaries must not straddle a packed-plane boundary:
        # int4 split-half needs (K/2) % gs == 0, int2 split-quarter (K/4)
        plane_rows = {4: k // 2, 2: k // 4}.get(ql.bits)
        if (plane_rows is None or plane_rows % group_size
                or group_size % 8):
            return None  # unsupported grouped shape: XLA path
    if n % 128 or k % 256:
        return None  # dispatch falls back to the XLA path
    # weight rows per byte-block: k/4 (int2), k/2 (int4), or k (int8)
    w_rows = {2: k // 4, 4: k // 2}.get(ql.bits, k)
    cands = (2048,) + BN_CANDIDATES if ql.bits == 2 else BN_CANDIDATES
    bn = next((c for c in cands
               if n % c == 0 and w_rows * c <= W_BLOCK_VMEM_LIMIT), None)
    if bn is None:
        return None
    # Measured on v5e (Llama-8B decode shapes, weight-stream GB/s):
    #   int4 pallas 560-930 (bn-dependent) | int8 pallas 700 | XLA fallback 94
    #   | bf16 dense 755 — 8B decode 20.6 -> 17.8 ms/step with adaptive bn.
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    if m > M_MAX:
        return None  # prefill-sized: the XLA path handles it
    x2 = x.reshape(m, k).astype(jnp.bfloat16)

    # pad M to the sublane quantum (bf16 -> 16), capped by the VMEM budget
    bm = max(16, m + (-m % 16))
    if bm * k * 2 > XK_VMEM_LIMIT:
        return None
    mp = m + (-m % bm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))

    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    xsum = jnp.sum(x2.astype(jnp.float32), axis=1, keepdims=True)  # (mp, 1)

    if group_size is not None:
        g = k // group_size
        y = wg_grouped_matmul(x2, ql, mp, out_dtype)
        if y is None:
            if ql.bits == 2:
                return None
            # legacy broadcast-expand kernel covers int4 shapes the
            # chunk-grid kernel rejects (gs < 32, odd group counts)
            kfun = _w4_grouped_kernel(mp, k, n, g, bm, bn, oname)
            y = kfun(x2, ql.data, ql.scale.astype(jnp.float32),
                     ql.zero_point.astype(jnp.int32))
        if mp != m:
            y = y[:m]
        return y.reshape(*lead, n).astype(out_dtype)

    scale = jnp.broadcast_to(ql.scale.astype(jnp.float32).reshape(1, -1), (1, n))
    zp = jnp.broadcast_to(ql.zero_point.astype(jnp.int32).reshape(1, -1), (1, n))

    if ql.bits == 4:
        import os as _os

        kh = k // 2
        # large-K weights force a tiny bn under the single-block budget;
        # the K-split kernel keeps bn=1024 by streaming (bkh, bn) blocks
        bkh = next((c for c in range(2048, 255, -128) if kh % c == 0), None)
        if kh * 1024 > 2 * W_BLOCK_VMEM_LIMIT and bkh and n % 1024 == 0:
            big = int(_os.environ.get("PIQUANT_W4_BIGBLOCK", "0"))
            vmem_mb = int(_os.environ.get("PIQUANT_QMM_VMEM_MB", "100"))
            # budget check: x block (bm,k) bf16 double-buffered + ~6x the
            # packed (kh,big) block in unpack temporaries must fit the
            # raised ceiling — clamp bm down rather than OOM in Mosaic
            bmb = bm
            while bmb > 16 and (2 * bmb * k * 2 + 6 * kh * big
                                > (vmem_mb << 20)):
                bmb //= 2
            if big and n % big == 0 and (2 * bmb * k * 2 + 6 * kh * big
                                         <= (vmem_mb << 20)):
                # A/B: single full-K block at bn=big under a raised
                # scoped-VMEM ceiling, instead of the K-split stream
                kfun = _w4_kernel(mp, k, n, bmb, big, oname,
                                  vmem_mb=vmem_mb)
                y = kfun(x2, ql.data, scale,
                         zp.astype(jnp.float32) * scale, xsum)
            else:
                kfun = _w4_kernel_ksplit(mp, k, n, bm, 1024, bkh, oname)
                y = kfun(x2[:, :kh], x2[:, kh:], ql.data, scale,
                         zp.astype(jnp.float32) * scale, xsum)
            if mp != m:
                y = y[:m]
            return y.reshape(*lead, n).astype(out_dtype)
        # PIQUANT_W4_BN: force a larger N tile (raised scoped-VMEM ceiling
        # when the packed block exceeds the 2 MB default cap).  hbm_sol
        # sweep: 8 MB streaming blocks reach 809 GB/s vs 739 at 2 MB —
        # the default bn cap costs ~10-20% of weight-stream rate.
        want = int(_os.environ.get("PIQUANT_W4_BN", "0"))
        if want and n % want == 0:
            vm = (int(_os.environ.get("PIQUANT_QMM_VMEM_MB", "100"))
                  if kh * want > W_BLOCK_VMEM_LIMIT else 0)
            kfun = _w4_kernel(mp, k, n, bm, want, oname, vmem_mb=vm)
        else:
            kfun = _w4_kernel(mp, k, n, bm, bn, oname)
    elif ql.bits == 2:
        if k % 512:
            return None
        # NB: a K-split variant (third grid axis + f32 scratch, mirroring
        # _w4_kernel_ksplit) was measured at 345 GB/s vs 360 for this
        # single-K form on the 8B w1/w3 shape with long-chain slope timing —
        # no win, removed.  The honest INT2 fast path is W2A8 below
        # (int8 planes, 440-455 GB/s weight-stream).
        kfun = _w2_kernel(mp, k, n, bm, bn, oname)
    elif ql.bits == 8:
        kfun = _w8_kernel(mp, k, n, bm, bn, oname)
    else:
        return None
    y = kfun(x2, ql.data, scale, zp.astype(jnp.float32) * scale, xsum)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(out_dtype)


# ---------------------------------------------------------------------------
# MLP megakernel: w13 -> SwiGLU -> w2 in ONE pallas_call (decode M)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _mlp_fused_kernel(m: int, k: int, i_ff: int, n: int, bna: int,
                      bkh: int, bnb: int, act: str, out_dtype: str,
                      vmem_mb: int):
    """One kernel for y = swiglu(x@w1, x@w3) @ w2, channelwise INT4.

    MEASURED SLOWER e2e than the two-kernel path (see mlp_fused_matmul)
    — kept opt-in.  Phase A (i_ff//bna steps): stream TWO (k/2, bna) packed tiles of the
    fused [w1|w3] matrix (gate tile j and up tile i_ff/bna + j), unpack
    in-register, h tile -> a persistent VMEM scratch [m, i_ff] bf16 — the
    intermediate never touches HBM.  Phase B ((n//bnb)*(i_ff/2//bkh)
    steps, nt-major): stream (bkh, bnb) packed w2 tiles, split-half dot
    against h scratch slices, accumulate in the resident out block; the
    w2 zero-point folds per chunk via that chunk's own h-column sums so
    no cross-phase state is needed.  Removes the w13->w2 kernel boundary
    (the per-boundary DMA pipeline drain/fill measured ~6 us/layer via
    the r5 fusion A/B) on top of the w13 fusion win.

    Reference anchor: the fused quantize->compute chain the reference
    builds per-call in C++ (src/kernels/kernels.inl:30-52), taken one
    level further: two matmuls + activation in one scheduled stream.
    """
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.float32
    kh = k // 2
    ih = i_ff // 2
    na = i_ff // bna
    nkc = ih // bkh
    nb = n // bnb
    ib = i_ff // bna  # block offset of the UP half inside fused w13

    def kern(x_ref, wg_ref, wu_ref, sg_ref, su_ref, zsg_ref, zsu_ref,
             w2_ref, s2_ref, zs2_ref, xsum_ref, o_ref, h_ref):
        ii = pl.program_id(0)

        @pl.when(ii < na)
        def _phase_a():
            j = ii
            x = x_ref[:]
            xs = xsum_ref[:]

            def half(w_ref, s_ref, zs_ref):
                b = w_ref[:].astype(jnp.int32)
                lo = (b & 15).astype(jnp.bfloat16)
                hi = (b >> 4).astype(jnp.bfloat16)
                acc = jnp.dot(x[:, :kh], lo,
                              preferred_element_type=jnp.float32)
                acc += jnp.dot(x[:, kh:], hi,
                               preferred_element_type=jnp.float32)
                return acc * s_ref[:] - xs * zs_ref[:]

            g = half(wg_ref, sg_ref, zsg_ref)
            u = half(wu_ref, su_ref, zsu_ref)
            hg = (jax.nn.gelu(g, approximate=True) if act == "gelu"
                  else jax.nn.silu(g))
            h_ref[:, pl.ds(j * bna, bna)] = (hg * u).astype(jnp.bfloat16)

        @pl.when(ii >= na)
        def _phase_b():
            b = (ii - na).astype(jnp.int32) if hasattr(ii, "astype") else ii - na
            kc = jax.lax.rem(jnp.int32(0) + b, jnp.int32(nkc))
            hlo = h_ref[:, pl.ds(kc * bkh, bkh)].astype(jnp.bfloat16)
            hhi = h_ref[:, pl.ds(ih + kc * bkh, bkh)].astype(jnp.bfloat16)
            wb = w2_ref[:].astype(jnp.int32)
            lo = (wb & 15).astype(jnp.bfloat16)
            hi = (wb >> 4).astype(jnp.bfloat16)
            acc = jnp.dot(hlo, lo, preferred_element_type=jnp.float32)
            acc += jnp.dot(hhi, hi, preferred_element_type=jnp.float32)
            # per-chunk zero-point fold: this chunk's h-column sums
            hsum = (jnp.sum(hlo.astype(jnp.float32), axis=1, keepdims=True)
                    + jnp.sum(hhi.astype(jnp.float32), axis=1,
                              keepdims=True))
            part = acc * s2_ref[:] - hsum * zs2_ref[:]

            @pl.when(kc == 0)
            def _():
                o_ref[:] = part.astype(odt)

            @pl.when(kc != 0)
            def _():
                o_ref[:] = o_ref[:] + part.astype(odt)

    grid = (na + nb * nkc,)

    def a_idx(i):
        return (0, jnp.minimum(i, na - 1))

    def a_idx_up(i):
        return (0, ib + jnp.minimum(i, na - 1))

    def b_idx(i):
        b = jnp.maximum(jnp.int32(0) + i - na, 0).astype(jnp.int32)
        return (jax.lax.rem(b, jnp.int32(nkc)), b // nkc)

    def o_idx(i):
        return (0, jnp.maximum(jnp.int32(0) + i - na, 0).astype(jnp.int32)
                // nkc)

    def s2_idx(i):
        return (0, jnp.maximum(jnp.int32(0) + i - na, 0).astype(jnp.int32)
                // nkc)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bna), a_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bna), a_idx_up, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bna), a_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bna), a_idx_up, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bna), a_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bna), a_idx_up, memory_space=pltpu.VMEM),
            pl.BlockSpec((bkh, bnb), b_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bnb), s2_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bnb), s2_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bnb), o_idx, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, i_ff), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_mb << 20),
    )


def mlp_fused_matmul(x: Array, w13, w2, act: str,
                     out_dtype=jnp.bfloat16) -> Optional[Array]:
    """Decode-M SwiGLU MLP through the single fused kernel, or None when
    the geometry/layout can't take it (caller falls back to two qmms).

    Requirements: channelwise INT4 both weights, tp=1 fused [w1|w3]
    layout, M <= M_MAX, 128-aligned dims.
    """
    import os as _os

    # default OFF: measured 9.27 vs 9.02 ms/step on the 8B decode A/B —
    # the single "arbitrary" grid axis serializes phase-A steps that the
    # separate kernels overlap with "parallel" semantics, costing more
    # than the removed kernel boundary saves.  Kept opt-in for study
    # (compiles+runs on hardware, numerics validated).
    if _os.environ.get("PIQUANT_MLP_FUSE", "0") != "1":
        return None
    for ql in (w13, w2):
        if (not hasattr(ql, "bits") or ql.bits != 4
                or ql.group_size is not None
                or getattr(ql, "codebook", None) is not None):
            return None
    lead, k = x.shape[:-1], x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    if m > M_MAX:
        return None
    i2 = w13.n
    if i2 % 2:
        return None
    i_ff = i2 // 2
    n = w2.n
    if w2.k != i_ff or w13.k != k:
        return None
    bna = next((c for c in (1024, 512, 256) if i_ff % c == 0), None)
    bnb = next((c for c in (1024, 512, 256) if n % c == 0), None)
    bkh = next((c for c in (1024, 512, 256) if (i_ff // 2) % c == 0), None)
    if (bna is None or bnb is None or bkh is None or k % 256
            or i_ff % 256):
        return None
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    mp = max(16, m + (-m % 16))
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    oname = "bf16" if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16) else "f32"
    xsum = jnp.sum(x2.astype(jnp.float32), axis=1, keepdims=True)
    s13 = w13.scale.astype(jnp.float32).reshape(1, -1)
    zs13 = w13.zero_point.astype(jnp.float32).reshape(1, -1) * s13
    s2 = w2.scale.astype(jnp.float32).reshape(1, -1)
    zs2 = w2.zero_point.astype(jnp.float32).reshape(1, -1) * s2
    vmem_mb = int(_os.environ.get("PIQUANT_QMM_VMEM_MB", "100"))
    kf = _mlp_fused_kernel(mp, k, i_ff, n, bna, bkh, bnb, act, oname,
                           vmem_mb)
    y = kf(x2, w13.data, w13.data, s13, s13, zs13, zs13, w2.data, s2,
           zs2, xsum)
    if mp != m:
        y = y[:m]
    return y.reshape(*lead, n).astype(out_dtype)
