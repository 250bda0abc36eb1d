"""Headline quantize-kernel streaming rate vs elementwise block size.

hbm_sol's read-only sweep says the f32 stream peaks at 4 MB blocks
(818 GB/s = HBM SOL) and dips at 2 MB (651).  This measures the actual
f32->uint8 quantize kernel (bench.py's op and chain protocol) across
PIQUANT_BLOCK_ROWS so the default in ops/pallas/common.py is chosen on
the production kernel, not the probe.

Traffic accounting matches bench.py: 4 B read + 1 B write per element.

Run: python benchmarks/quantize_block_sweep.py [factor]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

N = 27_264_000
K1, K2 = 4, 20
HBM_GBS = 819.0


def bench_block(n, block_rows):
    import piquant_tpu as pq

    os.environ["PIQUANT_BLOCK_ROWS"] = str(block_rows)
    scale, zp = 0.0157, 128

    def mk(iters):
        @jax.jit
        def chain(x):
            def step(x_, _):
                q = pq.quantize(x_, scale, zp, "uint8")
                upd = x_[:8] + q[:8].astype(jnp.float32) * 1e-7
                return jax.lax.dynamic_update_slice(x_, upd, (0,)), None
            xf, _ = jax.lax.scan(step, x, None, length=iters)
            return xf[:1]
        return chain

    x = jax.random.normal(jax.random.key(0), (n,), jnp.float32)
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(x)); np.asarray(f2(x))

    def t_of(f, salt):
        best = 1e9
        for i in range(4):
            xi = x + (salt * 4 + i) * 1e-7
            np.asarray(xi[:1])
            t0 = time.perf_counter()
            np.asarray(f(xi))
            best = min(best, time.perf_counter() - t0)
        return best

    est = []
    for attempt in range(4):
        t_iter = (t_of(f2, 2 * attempt + 1) - t_of(f1, 2 * attempt)) / (K2 - K1)
        gbs = n * 5 / t_iter / 1e9
        if 0 < gbs <= HBM_GBS * 1.05:
            est.append(gbs)
        if len(est) >= 2:
            break
    got = float(np.median(est)) if est else 0.0
    in_mb = block_rows * 128 * 4 / 2**20
    print(f"block_rows {block_rows:6d} ({in_mb:5.1f} MB f32 in): "
          f"{got:6.1f} GB/s", flush=True)
    return got


def main(factor=8):
    n = N * factor
    results = {}
    for br in (2048, 4096, 8192, 16384, 3072, 6144):
        try:
            results[br] = bench_block(n, br)
        except Exception as e:
            print(f"block_rows {br}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    os.environ.pop("PIQUANT_BLOCK_ROWS", None)
    if results:
        best = max(results, key=results.get)
        print(f"\nbest: block_rows={best} at {results[best]:.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
