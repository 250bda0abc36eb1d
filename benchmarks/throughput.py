"""Reference benchmark protocol ports (run on the real chip).

1. bf16 <-> quint4x2 / quint2x4 quant+dequant GiB/s (reference
   python/benchmark/throughput_avg.py:9-42 — 32 GiB total there; sized here
   to chip memory and measured by chain slope).
2. 2^30-element bf16->uint4 quantize + uint4->bf16 dequantize
   (reference benchmark/bench.cpp:15-35).

Prints one line per protocol.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import piquant_tpu as pq


def chain_slope(step, x, k1=6, k2=24, reps=3):
    def mk(k):
        @jax.jit
        def run(v):
            y = jax.lax.fori_loop(0, k, lambda i, c: step(c), v)
            return y.reshape(-1)[:1]
        return run

    f1, f2 = mk(k1), mk(k2)
    np.asarray(f1(x)); np.asarray(f2(x))

    def t_of(f):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t_of(f2) - t_of(f1)) / (k2 - k1)


def roundtrip_protocol(qname, n, scale=0.05, zp=None):
    dt = pq.DTYPES[qname]
    zp = zp if zp is not None else (dt.qmax + 1) // 2

    def step(c):
        packed = pq.quantize(c, scale, zp, qname)
        return pq.dequantize(packed, scale, zp, qname, out_dtype="bf16", numel=n
                             ).astype(jnp.bfloat16)

    x = jax.random.normal(jax.random.key(0), (n,), jnp.bfloat16)
    s = chain_slope(step, x)
    # traffic per iter: read 2B + write bits/8 + read bits/8 + write 2B
    bytes_iter = n * (2 + dt.bits / 8 + dt.bits / 8 + 2)
    print(f"bf16<->{qname}: {s*1e3:.2f} ms/iter, "
          f"{bytes_iter/s/2**30:.1f} GiB/s (numel {n})", flush=True)


def main():
    n = 1 << 28  # 268M elements of bf16 = 512 MiB live
    roundtrip_protocol("uint4", n)
    roundtrip_protocol("uint2", n)

    # bench.cpp protocol: 2^30 elements bf16->uint4 + uint4->bf16
    n = 1 << 30
    scale, zp = 0.05, 8

    def step(c):
        packed = pq.quantize(c, scale, zp, "uint4")
        return pq.dequantize(packed, scale, zp, "uint4", out_dtype="bf16",
                             numel=n).astype(jnp.bfloat16)

    x = jax.random.normal(jax.random.key(1), (n,), jnp.bfloat16)
    s = chain_slope(step, x, k1=3, k2=9)
    print(f"2^30 bf16->uint4->bf16: {s*1e3:.1f} ms/iter "
          f"({n*5/s/2**30:.1f} GiB/s)", flush=True)


if __name__ == "__main__":
    main()
