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
# Slope endpoints: both large enough that on-device time (>= ~2 ms) dwarfs
# the ~1 ms tunnel-dispatch jitter, far enough apart for a stable slope.
SMALL_FACTOR = 8
SCALE_FACTOR = 32
REPS = 4


def time_call(f, make_x, reps):
    """Min wall time over distinct freshly-staged inputs (distinct data
    defeats relay-level result caching; staging is outside the timed span);
    fetching one byte forces device completion."""
    best = 1e9
    for i in range(reps):
        x = make_x(i)
        np.asarray(x[:1])  # ensure staging finished
        t0 = time.perf_counter()
        y = f(x)
        np.asarray(y[:1])
        best = min(best, time.perf_counter() - t0)
        del x, y
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

    def mk(factor):
        def make_x(i):
            return jax.random.normal(jax.random.fold_in(key, factor * 1000 + i),
                                     (N * factor,), jnp.float32)
        return make_x

    # warm compile both sizes
    np.asarray(quant(mk(SMALL_FACTOR)(99))[:1])
    np.asarray(quant(mk(SCALE_FACTOR)(99))[:1])

    t_small = time_call(quant, mk(SMALL_FACTOR), REPS)
    t_big = time_call(quant, mk(SCALE_FACTOR), REPS)
    dt = t_big - t_small
    delta_elems = N * (SCALE_FACTOR - SMALL_FACTOR)
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
