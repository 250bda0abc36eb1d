"""Throughput measurement + profiling helpers.

Covers the reference's benchmark-script roles (python/benchmark/
throughput_avg.py GiB/s harness, benchmark/bench.cpp) with a method that is
honest on this stack: per-dispatch wall clock through the TPU relay is
unreliable (async completion, result caching), so throughput is measured as
a SLOPE — either across chained iteration counts (pallas ops, which XLA
cannot fuse away) or across input sizes — with a forced one-byte device
fetch as the sync point.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sync(y) -> None:
    leaf = jax.tree.leaves(y)[0]
    np.asarray(leaf.reshape(-1)[:1])


def slope_time(make_run: Callable[[int], Callable], x, k1: int = 8, k2: int = 32,
               reps: int = 4) -> float:
    """Seconds per iteration from the (k2 - k1) slope of chained runs.

    make_run(k) must return a jitted callable executing k data-dependent
    iterations (use lax.fori_loop; pallas calls in the body are not fusable
    so their HBM traffic is real).
    """
    f1, f2 = make_run(k1), make_run(k2)
    _sync(f1(x)); _sync(f2(x))
    b1 = b2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _sync(f1(x)); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(f2(x)); b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (k2 - k1)


def measure_throughput(step: Callable, x, bytes_per_iter: int, *,
                       k1: int = 8, k2: int = 32, reps: int = 4) -> dict:
    """GB/s of `step` (x -> x-like) chained under jit.  Returns a report."""

    def make_run(k):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), v)
        return run

    s_per_iter = slope_time(make_run, x, k1, k2, reps)
    return {
        "s_per_iter": s_per_iter,
        "gb_per_s": bytes_per_iter / s_per_iter / 1e9 if s_per_iter > 0 else float("inf"),
        "bytes_per_iter": bytes_per_iter,
    }


def trace(path: str = "/tmp/piquant_tpu_trace"):
    """Context manager: capture a jax.profiler trace (view with XProf)."""
    return jax.profiler.trace(path)


def hbm_roofline(bytes_moved: int, seconds: float,
                 peak_gbps: float = 819.0) -> dict:
    """Fraction of HBM speed-of-light achieved (v5e default peak)."""
    achieved = bytes_moved / seconds / 1e9
    return {"achieved_gbps": achieved, "peak_gbps": peak_gbps,
            "fraction_of_peak": achieved / peak_gbps}
