"""Single-chip cost of one quantized-collective hop's COMPUTE half.

A ring hop = quantize(chunk) -> wire -> [ppermute] -> split -> dequant-ADD.
With one chip the ICI transfer can't be timed, but the quantize/dequant
halves can (they bound how much hop compute overlaps the transfer).  Chain
protocol per NOTES.md: in-jit fori_loop with a data dependence, slope over
two trip counts.

Usage: python benchmarks/collective_hop.py [chunk_mb]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from piquant_tpu.dtypes import DTYPES
from piquant_tpu.parallel import collectives as C


def main(chunk_mb=16, qname="uint8"):
    dt = DTYPES[qname]
    n = chunk_mb * 1024 * 1024 // 4          # f32 elements
    x = jax.random.normal(jax.random.key(0), (n,), jnp.float32)
    acc = jax.random.normal(jax.random.key(1), (n,), jnp.float32)

    def chain(k):
        @jax.jit
        def run(x_, a_):
            def body(i, carry):
                x_, a_ = carry
                wire = C._quantize_chunk(x_, dt, "nearest", None)
                packed, scale, zp = C._wire_split(wire, n, dt)
                a2 = C._dequantize_chunk(packed, scale, zp, n, dt,
                                         DTYPES["f32"], add_to=a_)
                # serialize: next iteration's input depends on this output
                return x_ + a2[:1] * jnp.float32(1e-9), a2
            x_, a_ = jax.lax.fori_loop(0, k, body, (x_, a_))
            return a_[:1]
        return run

    f1, f2 = chain(4), chain(20)
    np.asarray(f1(x, acc)); np.asarray(f2(x, acc))

    def t_of(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(x, acc))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_of(f2) - t_of(f1)) / 16
    gb = n * 4 / 1e9
    print(f"hop compute ({qname}, {chunk_mb} MiB f32 chunk): "
          f"{per*1e3:.3f} ms -> {gb/per:.0f} GB/s chunk-stream "
          f"(wire payload {n * dt.bits // 8 / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    main(mb)
    main(mb, "uint4")
