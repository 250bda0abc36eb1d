"""Headline benchmark: f32 -> uint8 per-tensor quantize GB/s on one chip.

Replicates the reference's benchmark protocol (README.md:74: numel
27,264,000, vs torch.quantize_per_tensor) on TPU.  Prints ONE JSON line:
{"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": ours/torch}.

Timing method: the axon relay makes per-dispatch wall-clock unreliable
(async completion + result caching), so throughput is measured as a SIZE
SLOPE: time single dispatches at N and 8N on distinct pre-staged inputs and
divide the traffic delta by the time delta — fixed dispatch/tunnel overhead
cancels.  Bytes counted as read+write (4 + 1 per element).
"""

import json
import sys
import time

import numpy as np

N = 27_264_000
SCALE_FACTOR = 8
REPS = 5


def time_call(f, xs):
    """Min wall time over distinct inputs; fetch one byte to force sync."""
    best = 1e9
    for x in xs:
        t0 = time.perf_counter()
        y = f(x)
        np.asarray(y[:1])  # forces device completion + transfer of 1 byte
        best = min(best, time.perf_counter() - t0)
    return best


def bench_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import piquant_tpu as pq

    scale, zp = 0.0157, 128

    @jax.jit
    def quant(x):
        return pq.quantize(x, scale, zp, "uint8")

    key = jax.random.key(0)
    xs_small = [jax.random.normal(jax.random.fold_in(key, i), (N,), jnp.float32)
                for i in range(REPS)]
    xs_big = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                                (N * SCALE_FACTOR,), jnp.float32)
              for i in range(REPS)]
    # warm compile both sizes
    np.asarray(quant(xs_small[0])[:1])
    np.asarray(quant(xs_big[0])[:1])

    t_small = time_call(quant, xs_small)
    t_big = time_call(quant, xs_big)
    dt = t_big - t_small
    delta_elems = N * (SCALE_FACTOR - 1)
    if dt <= 0:
        # fall back to the big-size absolute time (overhead makes this a
        # LOWER bound on throughput)
        dt = t_big
        delta_elems = N * SCALE_FACTOR
    gbs = delta_elems * 5 / dt / 1e9
    return gbs


def bench_torch_baseline():
    """torch.quantize_per_tensor GB/s on this host's CPU (reference's
    comparison target, python/benchmark/benchmark.py:37-60)."""
    try:
        import torch
    except ImportError:
        return None
    x = torch.randn(N, dtype=torch.float32)
    torch.quantize_per_tensor(x, 0.0157, 128, torch.quint8)  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        torch.quantize_per_tensor(x, 0.0157, 128, torch.quint8)
        best = min(best, time.perf_counter() - t0)
    return N * 5 / best / 1e9


def main():
    gbs = bench_tpu()
    base = bench_torch_baseline()
    vs = gbs / base if base else None
    print(json.dumps({
        "metric": "f32->uint8 quantize GB/s/chip (numel 27264000)",
        "value": round(gbs, 1),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
