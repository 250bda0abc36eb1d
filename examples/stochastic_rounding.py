"""Stochastic vs nearest rounding: per-element error and accumulated bias.

The reference ships this demo as its only pedagogical artifact
(/root/reference/python/example/plot_stochastic_rounding_acc.py:1-71):
quantize a uniform tensor to uint4 with both round modes, compare the
dequantization-error distributions (MAE/MSE + CDF plot), and sanity-check
the half-step bound.  This is the TPU-native equivalent, with one upgrade
that motivates why the quantized collectives default to stochastic
rounding (parallel/collectives.py): an ACCUMULATED-BIAS experiment.

Nearest rounding has lower per-element error (its MAE is ~half a step's
expectation) but its errors are *correlated with the data*: summing N
independently-quantized copies of the same tensor — exactly what a
gradient all-reduce does across data-parallel replicas — accumulates a
bias that grows with N.  Stochastic rounding is unbiased per element
(E[dq(q(x))] = x, per-element PRNG — ops/pallas/quantize.py upgrades the
reference's per-call shared threshold, src/piquant.cpp:194-201), so the
accumulated error of the MEAN falls as 1/sqrt(N) instead of plateauing.

Run: python examples/stochastic_rounding.py [N_accum]
Writes quant_error_cdf.png when matplotlib is available.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# honor an explicit platform override before any backend use (some remote
# TPU plugins otherwise block at import even with JAX_PLATFORMS set)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

import piquant_tpu as pq


def main(n_accum: int = 64) -> None:
    key = jax.random.key(42)
    x = jax.random.uniform(key, (1000,), jnp.float32)

    scale, zp = pq.compute_quant_params(x, "uint4")
    print(f"scale={float(scale):.8g}  zero_point={int(zp)}")

    dq_near = pq.dequantize(
        pq.quantize(x, scale, zp, "uint4"), scale, zp, "uint4",
        numel=x.size)
    dq_sto = pq.dequantize(
        pq.quantize(x, scale, zp, "uint4", round_mode="stochastic",
                    key=jax.random.key(7)),
        scale, zp, "uint4", numel=x.size)

    xn = np.asarray(x, np.float64)
    err_near = np.abs(np.asarray(dq_near, np.float64) - xn)
    err_sto = np.abs(np.asarray(dq_sto, np.float64) - xn)
    print(f"Nearest   : MAE={err_near.mean():.6e}  "
          f"MSE={(err_near ** 2).mean():.6e}")
    print(f"Stochastic: MAE={err_sto.mean():.6e}  "
          f"MSE={(err_sto ** 2).mean():.6e}")

    step = float(scale)
    print(f"Sanity: nearest within step/2 + eps? "
          f"{bool(err_near.max() <= step / 2 + 1e-3)}")
    print(f"        stochastic within one step?  "
          f"{bool(err_sto.max() <= step + 1e-3)}")

    # Accumulated bias: mean of N independently-quantized copies (the
    # data-parallel gradient-sum pattern).  Nearest's per-element error is
    # deterministic, so averaging N copies never cancels it; stochastic's
    # zero-mean error shrinks as 1/sqrt(N).
    print(f"\naccumulated-mean error over N copies (N={n_accum}):")
    print(f"{'N':>6} {'nearest':>12} {'stochastic':>12}")
    acc_sto = np.zeros_like(xn)
    checkpoints = {1, 4, 16, n_accum}
    for i in range(n_accum):
        dq_i = pq.dequantize(
            pq.quantize(x, scale, zp, "uint4", round_mode="stochastic",
                        key=jax.random.key(100 + i)),
            scale, zp, "uint4", numel=x.size)
        acc_sto += np.asarray(dq_i, np.float64)
        n = i + 1
        if n in checkpoints:
            near_bias = np.abs(np.asarray(dq_near, np.float64) - xn).mean()
            sto_bias = np.abs(acc_sto / n - xn).mean()
            print(f"{n:>6} {near_bias:>12.3e} {sto_bias:>12.3e}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("\n(matplotlib not installed — skipping the CDF plot)")
        return

    def cdf(e):
        s = np.sort(e)
        return s, np.linspace(0.0, 1.0, s.size, endpoint=False)

    plt.figure()
    for e, name in ((err_near, "Nearest"), (err_sto, "Stochastic")):
        s, y = cdf(e)
        plt.plot(s, y, label=f"{name} (MAE={e.mean():.3e})")
    plt.xlabel("Absolute error")
    plt.ylabel("CDF")
    plt.title("uint4 quantization: nearest vs stochastic dequant error")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.4)
    plt.tight_layout()
    plt.savefig("quant_error_cdf.png", dpi=160)
    print("\nwrote quant_error_cdf.png")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
