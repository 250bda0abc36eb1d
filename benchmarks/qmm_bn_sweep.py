"""Production quantized_matmul weight-stream rate vs N-tile size (v5e).

hbm_sol's sweep shows 8 MB streaming blocks reach ~809 GB/s (99% of the
819 SOL) while the kernels' 2 MB default cap lands at ~645-739.  This
sweeps PIQUANT_W4_BN over the real decode matmul shapes (Llama-8B) through
the production dispatch path, chain-slope timed.

Run: python benchmarks/qmm_bn_sweep.py [m]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from piquant_tpu.quant.linear import quantize_linear_weight

SHAPES = {  # Llama-3-8B decode projections
    "wqkv": (4096, 6144),
    "wo":   (4096, 4096),
    "w13":  (4096, 14336),
    "w2":   (14336, 4096),
}


def bench(name, k, n, m, bn_env):
    from piquant_tpu.ops.pallas import qmatmul as Q

    # large-K shapes (w2) take the early big-block/K-split branch, gated
    # by PIQUANT_W4_BIGBLOCK; the rest by PIQUANT_W4_BN
    for v in ("PIQUANT_W4_BN", "PIQUANT_W4_BIGBLOCK"):
        os.environ.pop(v, None)
    if bn_env:
        knob = "PIQUANT_W4_BIGBLOCK" if k // 2 * 1024 > 4 * 2**20 else "PIQUANT_W4_BN"
        os.environ[knob] = str(bn_env)
    Q._w4_kernel.cache_clear()

    w = jax.random.normal(jax.random.key(0), (k, n), jnp.float32) * 0.02
    ql = quantize_linear_weight(w, 4)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.bfloat16)

    def chain(x0, iters, data, scale, zp):
        import dataclasses as dc
        ql2 = dc.replace(ql, data=data, scale=scale, zero_point=zp)

        def body(i, xv):
            y = Q.quantized_matmul(xv, ql2, jnp.bfloat16)
            assert y is not None
            # feed a k-sized slice back (data dependence, tiny traffic)
            return xv + jnp.sum(y) * jnp.bfloat16(1e-9)
        return jax.lax.fori_loop(0, iters, body, x0)[:1, :1]

    f = jax.jit(chain, static_argnums=(1,))
    args = (ql.data, ql.scale, ql.zero_point)
    # iteration counts sized so the k2-k1 delta is >= ~25 ms of device
    # time (NOTES.md: short slope deltas swing +/-50%; small weights like
    # wqkv at ~17 us/pass need ~1500 iterations, not 256)
    per_est = (k * n / 2) / 700e9
    kdelta = max(256, int(0.025 / per_est))
    kdelta = min(kdelta, 4096)
    k1, k2 = 16, 16 + kdelta
    np.asarray(f(x, 1, *args))
    np.asarray(f(x, k1, *args)); np.asarray(f(x, k2, *args))  # compile both

    def t_of(kk, salt):
        # salt the input per rep: the relay caches results for repeated
        # identical calls (NOTES.md), and min-of-5 beats its jitter
        best = 1e9
        for i in range(5):
            xi = x + (salt * 8 + i) * jnp.bfloat16(1e-6)
            np.asarray(xi[:1, :1])
            t0 = time.perf_counter()
            np.asarray(f(xi, kk, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_of(k2, 1) - t_of(k1, 0)) / kdelta
    gbs = (k * n / 2) / per / 1e9
    print(f"{name:5s} K={k:5d} N={n:5d} bn={bn_env or 'auto':>5}: "
          f"{per*1e6:7.1f} us  {gbs:6.1f} GB/s", flush=True)
    return gbs


def main(m=8):
    for name, (k, n) in SHAPES.items():
        large_k = k // 2 * 1024 > 4 * 2**20
        for bn in ((0, 512, 1024) if large_k else (0, 2048, 4096)):
            if bn and n % bn:
                continue
            try:
                bench(name, k, n, m, bn)
            except Exception as e:
                print(f"{name:5s} bn={bn}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    os.environ.pop("PIQUANT_W4_BN", None)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
