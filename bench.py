"""Headline benchmark: f32 -> uint8 per-tensor quantize GB/s on one chip.

Replicates the reference's benchmark protocol (README.md:74: numel
27,264,000, vs torch.quantize_per_tensor) on TPU.  Prints ONE JSON line:
{"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": ours/torch}.

Timing method: the axon relay makes per-dispatch wall-clock unreliable
(async completion + result caching), so throughput is measured as a CHAIN
SLOPE: two jitted scan chains (k1/k2 quantize iterations with a true data
dependence between iterations via a tiny dynamic-update-slice feedback that
XLA aliases in place) on distinct inputs per rep; the time delta divided by
(k2-k1) cancels dispatch/tunnel overhead.  Traffic = 4+1 bytes/element.
Estimates above the physical HBM bound are discarded and re-measured.
"""

import json
import sys
import time

import numpy as np

N = 27_264_000
FACTOR = 8          # chain input = 8x the protocol numel (keeps per-iter
                    # device time ~1.3 ms >> relay jitter)
K1, K2 = 4, 20
REPS = 4
HBM_GBS = 819.0     # v5e physical ceiling — estimates above this are noise


def bench_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import piquant_tpu as pq

    scale, zp = 0.0157, 128
    n = N * FACTOR

    def mk(iters):
        @jax.jit
        def chain(x):
            def step(x_, _):
                q = pq.quantize(x_, scale, zp, "uint8")
                # tiny data-dependent feedback: in-place 8-elem DUS keeps the
                # chain serial without adding full-array traffic
                upd = x_[:8] + q[:8].astype(jnp.float32) * 1e-7
                return jax.lax.dynamic_update_slice(x_, upd, (0,)), None
            xf, _ = jax.lax.scan(step, x, None, length=iters)
            return xf[:1]
        return chain

    key = jax.random.key(0)
    x = jax.random.normal(key, (n,), jnp.float32)
    f1, f2 = mk(K1), mk(K2)
    np.asarray(f1(x)); np.asarray(f2(x))  # compile + warm

    # In-run correctness gate (reference python/benchmark/benchmark.py:61-71
    # asserts dequant equivalence every run): quantize a 1M slice on the
    # chip being timed and require every dequantized element within one LSB
    # of the clipped input.  A silent numerics regression then fails the
    # benchmark instead of printing a great GB/s.
    xs = np.asarray(x[:1_000_000])
    q = np.asarray(pq.quantize(jnp.asarray(xs), scale, zp, "uint8"))
    dq = (q.astype(np.float32) - zp) * scale
    ref = np.clip(np.round(xs / scale) + zp, 0, 255)
    err = np.abs(dq - (ref - zp) * scale)
    assert err.max() <= scale + 1e-6, f"quantize numerics off: {err.max()}"
    exact = float((q == ref.astype(np.uint8)).mean())
    assert exact > 0.999, f"only {exact:.4f} exact vs round-nearest oracle"

    def t_of(f, salt):
        best = 1e9
        for i in range(REPS):
            xi = x + (salt * REPS + i) * 1e-7  # distinct data per rep
            np.asarray(xi[:1])                 # staging outside timed span
            t0 = time.perf_counter()
            np.asarray(f(xi))
            best = min(best, time.perf_counter() - t0)
        return best

    estimates = []
    for attempt in range(5):
        t_iter = (t_of(f2, 2 * attempt + 1) - t_of(f1, 2 * attempt)) / (K2 - K1)
        gbs = n * 5 / t_iter / 1e9
        if 0 < gbs <= HBM_GBS * 1.05:
            estimates.append(gbs)
        if len(estimates) >= 3:
            break
    if not estimates:
        # every slope was implausible; report the K2 absolute time as a
        # LOWER bound (includes dispatch overhead)
        t = t_of(f2, 99) / K2
        return n * 5 / t / 1e9
    return float(np.median(estimates))


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
    for _ in range(7):  # single-vCPU hosts jitter hard; min-of-7
        t0 = time.perf_counter()
        torch.quantize_per_tensor(x, 0.0157, 128, torch.quint8)
        best = min(best, time.perf_counter() - t0)
    return N * 5 / best / 1e9


def _host_specs():
    """Baseline-host info so vs_baseline is interpretable (the reference's
    >2x claim was against a 360-vCPU EPYC; this host is much smaller)."""
    import os
    model = "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpus": os.cpu_count(), "cpu_model": model}


def main():
    # Watchdog: a wedged TPU relay otherwise blocks forever inside a device
    # call (where SIGALRM handlers never run); a daemon thread + os._exit
    # dies loudly instead so the harness sees a failure, not a hang.
    import os
    import threading

    def _abort():
        print("bench.py: TPU relay unresponsive (watchdog fired)",
              file=sys.stderr, flush=True)
        # still emit one parseable JSON line so the harness records an
        # honest "unavailable" datapoint instead of a bare timeout
        print(json.dumps({
            "metric": "f32->uint8 quantize GB/s/chip (numel 27264000)",
            "value": 0.0,
            "unit": "GB/s",
            "vs_baseline": None,
            "error": "tpu_relay_unresponsive",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(
        int(os.environ.get("PIQUANT_BENCH_TIMEOUT_S", "1500")), _abort)
    t.daemon = True
    t.start()
    gbs = bench_tpu()
    t.cancel()
    base = bench_torch_baseline()
    vs = gbs / base if base else None
    print(json.dumps({
        "metric": "f32->uint8 quantize GB/s/chip (numel 27264000)",
        "value": round(gbs, 1),
        "unit": "GB/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "verified": True,  # in-run dequant-equivalence gate passed (bench_tpu)
        "baseline_host": _host_specs(),
    }))


if __name__ == "__main__":
    sys.exit(main())
