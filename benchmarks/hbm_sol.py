"""Measure the chip's honest HBM streaming bandwidth (read-only).

Two protocols on the SAME trivial kernel (block-sum of a large uint8
array; 1 byte read per element, negligible writes):

 1. chain-slope: jitted lax.scan chain with data dependence (the repo's
    standard microbench protocol, NOTES.md).
 2. single-shot: one dispatch over a much larger array, timed
    wall-clock around a blocking readback (relay overhead amortized by
    sheer size).

If the two disagree, the chain protocol is broken for DMA-bound kernels
(e.g. the relay overlapping chained kernels more than a real model step
would) and single-shot is the honest speed-of-light reference.

Run: python benchmarks/hbm_sol.py [size_mb]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

ROWS_PER_BLOCK = 2048
COLS = 1024


def make_sum_kernel(rows: int, block_rows: int = ROWS_PER_BLOCK,
                    dtype=jnp.uint8):
    """Sum a (rows, COLS) array: reads rows*COLS*itemsize bytes, writes 4.

    f32 input is the purest DMA-bound probe (one add/elem); uint8 costs a
    u8->i32 conversion per element (4x lane expansion), so if the uint8
    number trails the f32 number at the same byte count the probe is
    VPU-bound, not at the HBM wall."""
    acc_dt = jnp.float32 if dtype == jnp.float32 else jnp.int32

    def kern(x_ref, salt_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[0, 0] = jnp.zeros((), acc_dt)

        # salt folds a data-dependent value in so chained iterations
        # cannot be collapsed; uint8 sums stay in i32
        part = jnp.sum(x_ref[:].astype(acc_dt))
        o_ref[0, 0] += part + salt_ref[0, 0].astype(acc_dt)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 1), acc_dt),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, COLS), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0),
                               memory_space=pltpu.SMEM),
    )


def chain_slope(size_mb: int = 32, k1: int = 8, k2: int = 48,
                block_kb: int = 2048, dtype=jnp.uint8):
    esz = jnp.dtype(dtype).itemsize
    rows = size_mb * 1024 * 1024 // (COLS * esz)
    block_rows = block_kb * 1024 // (COLS * esz)
    rows -= rows % block_rows
    kfun = make_sum_kernel(rows, block_rows, dtype)
    if dtype == jnp.float32:
        x = jax.random.normal(jax.random.key(0), (rows, COLS), jnp.float32)
    else:
        x = jax.random.randint(jax.random.key(0), (rows, COLS), 0, 256,
                               jnp.int32).astype(dtype)

    def mk(iters):
        @jax.jit
        def chain(s0):
            def step(s, _):
                y = kfun(x, s)
                return y, None
            sf, _ = jax.lax.scan(step, s0, None, length=iters)
            return sf
        return chain

    s0 = jnp.zeros((1, 1),
                   jnp.float32 if dtype == jnp.float32 else jnp.int32)
    f1, f2 = mk(k1), mk(k2)
    np.asarray(f1(s0)); np.asarray(f2(s0))

    def t_of(f, salt):
        best = 1e9
        for i in range(5):
            si = s0 + salt * 8 + i
            np.asarray(si)
            t0 = time.perf_counter()
            np.asarray(f(si))
            best = min(best, time.perf_counter() - t0)
        return best

    t_iter = (t_of(f2, 1) - t_of(f1, 0)) / (k2 - k1)
    gbs = rows * COLS * esz / t_iter / 1e9
    name = jnp.dtype(dtype).name
    print(f"chain-slope  {name:7s} {size_mb:5d} MB  blk {block_kb:5d} KB  "
          f"{t_iter*1e6:9.1f} us/pass  {gbs:7.1f} GB/s", flush=True)
    return gbs


def single_shot(size_mb: int = 1024):
    rows = size_mb * 1024 * 1024 // COLS
    kfun = jax.jit(make_sum_kernel(rows))
    x = jax.random.randint(jax.random.key(0), (rows, COLS), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    s0 = jnp.zeros((1, 1), jnp.int32)
    np.asarray(kfun(x, s0))  # compile+warm
    best = 1e9
    for i in range(5):
        si = s0 + i
        np.asarray(si)
        t0 = time.perf_counter()
        np.asarray(kfun(x, si))
        best = min(best, time.perf_counter() - t0)
    gbs = rows * COLS / best / 1e9
    print(f"single-shot  {size_mb:5d} MB  {best*1e3:9.2f} ms/pass  "
          f"{gbs:7.1f} GB/s", flush=True)
    return gbs


if __name__ == "__main__":
    # args: [size_mb] [sweep]
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    if len(sys.argv) > 2 and sys.argv[2] == "sweep":
        # block-size x dtype sweep: find the true streaming ceiling
        for dt in (jnp.float32, jnp.uint8):
            for bk in (1024, 2048, 4096, 8192):
                chain_slope(mb, block_kb=bk, dtype=dt)
    else:
        chain_slope(32)
        chain_slope(mb)
