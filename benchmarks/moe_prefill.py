"""MoE prefill: dense-all-experts vs grouped ragged GEMM (Mixtral geometry).

One MoE MLP layer at Mixtral-8x7B geometry (d_model 4096, d_ff 14336, E=8,
top_k=2, INT4 experts) over `NTOK` prefill tokens.  The dense path computes
every expert on every token (E/top_k = 4x the needed FLOPs); the ragged
path (PIQUANT_MOE_RAGGED=1, quant/moe.py + w4_ragged_matmul) computes only
the routed assignments.  Chain-slope timing per NOTES.md.

Usage: python benchmarks/moe_prefill.py [ntok]
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

from piquant_tpu.models import llama as M
from piquant_tpu.quant.linear import QuantizedExpertStack, quantize_linear_weight

D_MODEL, D_FF, E, TOPK = 4096, 14336, 8, 2


def build(key):
    from functools import partial

    @partial(jax.jit, static_argnums=(1, 2))
    def one(k_, kin, nout):
        return quantize_linear_weight(
            jax.random.normal(k_, (kin, nout), jnp.float32) * 0.02, bits=4)

    def stack(k_, kin, nout):
        s = QuantizedExpertStack.stack(
            [one(jax.random.fold_in(k_, i), kin, nout) for i in range(E)])
        jax.block_until_ready(s.data)
        print(f"  built stack {kin}x{nout}", flush=True)
        return s

    layer = {
        "router": jax.random.normal(key, (D_MODEL, E), jnp.float32) * 0.02,
        "moe_w1": stack(jax.random.fold_in(key, 1), D_MODEL, D_FF),
        "moe_w3": stack(jax.random.fold_in(key, 2), D_MODEL, D_FF),
        "moe_w2": stack(jax.random.fold_in(key, 3), D_FF, D_MODEL),
    }
    return layer


def bench(cfg, layer, x, label):
    # Single-layer jit (chained fori bodies took >10 min to compile through
    # the remote tunnel); timing = slope over K queued async dispatches with
    # DISTINCT inputs (the relay caches identical dispatches, NOTES.md),
    # one sync at the end.  Each dispatch is tens of ms of device time, well
    # above relay jitter.
    # params as ARGUMENTS, never closure captures: jit inlines closed-over
    # device arrays as MLIR constants, which round-trips the full weights
    # device->host through the relay at lowering time (observed as an
    # indefinite hang on multi-100MB stacks)
    run = jax.jit(lambda p, x_: M._mlp_moe(cfg, p, x_)[:1, :1])
    xs = [x + jnp.bfloat16(i * 1e-6) for i in range(12)]
    for xi in xs[:2]:
        np.asarray(run(layer, xi))  # compile + warm

    def t_of(k, off):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run(layer, xs[off + i]) for i in range(k)]
            np.asarray(outs[-1]); [o.block_until_ready() for o in outs]
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_of(10, 2) - t_of(2, 0)) / 8
    ntok = x.shape[0] * x.shape[1]
    print(f"{label:8s}: {per*1e3:7.1f} ms/layer  ({ntok/per:.0f} tok/s-layer)",
          flush=True)
    return per


def main(ntok=4096):
    cfg = M.LlamaConfig.llama3_8b()
    import dataclasses
    cfg = dataclasses.replace(cfg, n_experts=E, moe_top_k=TOPK,
                              moe_renormalize=True)
    layer = build(jax.random.key(0))
    x = (jax.random.normal(jax.random.key(9), (1, ntok, D_MODEL), jnp.bfloat16)
         * 0.5)

    os.environ["PIQUANT_MOE_RAGGED"] = "0"
    dense = bench(cfg, layer, x, "dense")
    os.environ["PIQUANT_MOE_RAGGED"] = "1"
    ragged = bench(cfg, layer, x, "ragged")
    print(f"speedup: {dense/ragged:.2f}x (FLOP bound {E/TOPK:.1f}x)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
