"""Micro-benchmark: int4 fused dequant+matmul kernel variants (v5e).

Finds the fastest unpack strategy for the decode-shaped quantized matmul
(M small, K/N = Llama-8B projections).  Measured via the slope method
(chained in-jit iterations with real data dependence — see NOTES.md).

Run:  python benchmarks/qmm_variants.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

M, K, N = 8, 4096, 14336  # w1/w3 decode shape
BN = 128


def make_kernel(body, bm, k, n, bn):
    kh = k // 2

    def kern(x_ref, b_ref, s_ref, z_ref, o_ref):
        body(x_ref, b_ref, s_ref, z_ref, o_ref, kh)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bm, n), jnp.bfloat16),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
    )


# --- variant A: current (lo/hi extract, two dots) -------------------------
def body_a(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    b = b_ref[:].astype(jnp.int32)
    lo = (b & 15).astype(jnp.bfloat16)
    hi = ((b >> 4) & 15).astype(jnp.bfloat16)
    x = x_ref[:]
    acc = jnp.dot(x[:, :kh], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, kh:], hi, preferred_element_type=jnp.float32)
    s = s_ref[:]
    z = z_ref[:].astype(jnp.float32)
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc * s - xsum * (z * s)).astype(jnp.bfloat16)


# --- variant B: byte-dot trick (skip lo extraction) ------------------------
# x@lo + x_hi@hi  ==  x_lo@(lo + 16 hi)  +  (x_hi - 16 x_lo)@hi
def body_b(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    b = b_ref[:].astype(jnp.int32)
    bb = b.astype(jnp.bfloat16)            # exact: byte <= 255
    hi = (b >> 4).astype(jnp.bfloat16)     # no mask needed: b < 256
    x = x_ref[:]
    x_lo = x[:, :kh]
    x_adj = x[:, kh:] - 16.0 * x_lo
    acc = jnp.dot(x_lo, bb, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_adj, hi, preferred_element_type=jnp.float32)
    s = s_ref[:]
    z = z_ref[:].astype(jnp.float32)
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc * s - xsum * (z * s)).astype(jnp.bfloat16)


# --- variant C: bf16-domain unpack (mul+floor instead of shift) ------------
def body_c(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    bb = b_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    hi = jnp.floor(bb * 0.0625)            # exact in bf16 (values <= 255)
    x = x_ref[:]
    x_lo = x[:, :kh]
    x_adj = x[:, kh:] - 16.0 * x_lo
    acc = jnp.dot(x_lo, bb, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_adj, hi, preferred_element_type=jnp.float32)
    s = s_ref[:]
    z = z_ref[:].astype(jnp.float32)
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc * s - xsum * (z * s)).astype(jnp.bfloat16)


# --- variant D: DMA-only floor (no unpack; wrong result, ceiling probe) ----
def body_d(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    b = b_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    x = x_ref[:]
    acc = jnp.dot(x[:, :kh], b, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(jnp.bfloat16)


# --- variant E: mantissa bitcast (no int->float convert) -------------------
# bf16 bits 0x4300|c == 128.0 + c for c in 0..15 (mantissa granularity 1 on
# [128,256)); the +128 bias folds into the analytic zero-point correction.
# All unpack ops run in the 16-bit domain: widen, mask/shift, OR, bitcast.
def body_e(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    # Mosaic can't legalize u16 shrui, so only the lo nibble takes the
    # bitcast path (AND/OR legalize); hi keeps the i32 shift+convert.
    w16 = b_ref[:].astype(jnp.uint16)
    lo = pltpu.bitcast((w16 & 15) | 0x4300, jnp.bfloat16)      # 128 + lo
    hi = (b_ref[:].astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    x = x_ref[:]
    x_lo, x_hi = x[:, :kh], x[:, kh:]
    acc = jnp.dot(x_lo, lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
    s = s_ref[:]
    z = z_ref[:].astype(jnp.float32)
    xs_lo = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    xsum = xs_lo + jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
    # subtract the folded 128 bias of the lo plane + the usual zp term
    o_ref[:] = ((acc - 128.0 * xs_lo) * s - xsum * (z * s)).astype(jnp.bfloat16)


# --- variant G: uint8-domain bitwise, direct u8->bf16 cast -----------------
def body_g(x_ref, b_ref, s_ref, z_ref, o_ref, kh):
    b = b_ref[:]
    lo = (b & jnp.uint8(15)).astype(jnp.bfloat16)
    hi = (b >> jnp.uint8(4)).astype(jnp.bfloat16)
    x = x_ref[:]
    acc = jnp.dot(x[:, :kh], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x[:, kh:], hi, preferred_element_type=jnp.float32)
    s = s_ref[:]
    z = z_ref[:].astype(jnp.float32)
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc * s - xsum * (z * s)).astype(jnp.bfloat16)


VARIANTS = {"A_current": body_a, "B_bytedot": body_b, "C_bf16floor": body_c,
            "D_ceiling": body_d, "E_mantissa": body_e, "G_u8domain": body_g}


def bench(name, body, bn=BN, k1=16, k2=96):
    kfun = make_kernel(body, 16, K, N, bn)
    key = jax.random.key(0)
    x = jax.random.normal(key, (16, K), jnp.bfloat16)
    b = jax.random.randint(jax.random.key(1), (K // 2, N), 0, 256, jnp.int32).astype(jnp.uint8)
    s = jnp.full((1, N), 0.01, jnp.float32)
    z = jnp.full((1, N), 8, jnp.int32)

    def mk(iters):
        @jax.jit
        def chain(x0):
            def step(x_, _):
                y = kfun(x_, b, s, z)
                # feed a data-dependent perturbation back (defeats hoisting)
                return x_ + y[:, :1] * 1e-6, None
            xf, _ = jax.lax.scan(step, x0, None, length=iters)
            return xf[:1, :1]
        return chain

    f1, f2 = mk(k1), mk(k2)
    np.asarray(f1(x)); np.asarray(f2(x))  # compile+warm

    def t_of(f, salt):
        best = 1e9
        for i in range(5):
            # distinct input per rep defeats relay-level result caching
            xi = x + (salt * 8 + i) * 1e-7
            np.asarray(xi[:1, :1])
            t0 = time.perf_counter()
            np.asarray(f(xi))
            best = min(best, time.perf_counter() - t0)
        return best

    t_iter = (t_of(f2, 1) - t_of(f1, 0)) / (k2 - k1)
    gbs = (K // 2) * N / t_iter / 1e9
    print(f"{name:14s} bn={bn:4d} {t_iter*1e6:8.1f} us/matmul  {gbs:7.1f} GB/s (weight stream)", flush=True)
    return gbs


def check_correctness(body, bn=512):
    kfun = make_kernel(body, 16, K, N, bn)
    x = jax.random.normal(jax.random.key(0), (16, K), jnp.bfloat16)
    b = jax.random.randint(jax.random.key(1), (K // 2, N), 0, 256, jnp.int32).astype(jnp.uint8)
    s = jnp.full((1, N), 0.01, jnp.float32)
    z = jnp.full((1, N), 8, jnp.int32)
    y = np.asarray(kfun(x, b, s, z)).astype(np.float32)
    bi = np.asarray(b).astype(np.int64)
    codes = np.concatenate([bi & 15, bi >> 4], axis=0)
    w = (codes - 8) * 0.01
    ref = np.asarray(x).astype(np.float32) @ w
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"  rel err vs numpy: {err:.2e}")


if __name__ == "__main__":
    import os
    names = os.environ.get("PIQUANT_VARIANTS", "A_current,B_bytedot").split(",")
    bns = [int(v) for v in os.environ.get("PIQUANT_BNS", "128,256,512,1024").split(",")]
    for name in names:
        if name != "D_ceiling":
            print(name, "correctness @512:")
            try:
                check_correctness(VARIANTS[name])
            except Exception as e:
                print(f"  FAILED: {type(e).__name__}: {str(e)[:120]}")
    for bn in bns:
        for name in names:
            try:
                bench(name + f"@{bn}", VARIANTS[name], bn=bn)
            except Exception as e:
                print(f"{name:14s} bn={bn} FAILED: {type(e).__name__}: {str(e)[:100]}")
