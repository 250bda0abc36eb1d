"""MoE decode: dense-masked vs ragged expert streaming (Mixtral geometry).

One MoE MLP layer at Mixtral-8x7B geometry (d_model 4096, d_ff 14336, E=8,
top_k=2, INT4 experts) at DECODE shapes (M = batch tokens, default 8).

Unlike prefill (benchmarks/moe_prefill.py, where ragged wins 2.5x because
it skips E/top_k of the FLOPs), decode is weight-DMA-bound: with M=8 and
top-2 routing nearly every expert is touched, so BOTH paths stream ~the
whole expert stack per step and the MXU is idle either way.  The ragged
path adds sort/scatter bookkeeping per dispatch; the dense path adds 4x
(redundant) MXU work that hides under the DMA.  This benchmark measures
the ms/step of each so the serving default is chosen by numbers, not
prefill intuition (VERDICT r3 #7).

Chain-slope timing per NOTES.md.  Usage: python benchmarks/moe_decode.py [m]
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
        return s

    return {
        "router": jax.random.normal(key, (D_MODEL, E), jnp.float32) * 0.02,
        "moe_w1": stack(jax.random.fold_in(key, 1), D_MODEL, D_FF),
        "moe_w3": stack(jax.random.fold_in(key, 2), D_MODEL, D_FF),
        "moe_w2": stack(jax.random.fold_in(key, 3), D_FF, D_MODEL),
    }


def bench(cfg, layer, x, label):
    # in-jit fori chain, dynamic trip count, params as arguments (NOTES.md:
    # closed-over weights lower as MLIR constants through the relay)
    @jax.jit
    def run(p, x_, k):
        def body(i, xv):
            y = M._mlp_moe(cfg, p, xv)
            return xv + y * jnp.bfloat16(1e-3)
        return jax.lax.fori_loop(0, k, body, x_)[:1, :1]

    np.asarray(run(layer, x, 1))  # compile + warm

    def t_of(k):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(layer, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_of(24) - t_of(4)) / 20
    print(f"{label:12s}: {per*1e3:7.2f} ms/layer-step", flush=True)
    return per


def main(m=8):
    import dataclasses
    cfg = dataclasses.replace(M.LlamaConfig.llama3_8b(), n_experts=E,
                              moe_top_k=TOPK, moe_renormalize=True)
    layer = build(jax.random.key(0))
    # decode shape: [B, 1, D] tokens
    x = (jax.random.normal(jax.random.key(9), (m, 1, D_MODEL), jnp.bfloat16)
         * 0.5)

    os.environ["PIQUANT_MOE_RAGGED"] = "0"
    dense = bench(cfg, layer, x, "dense-masked")
    os.environ["PIQUANT_MOE_RAGGED"] = "1"
    ragged = bench(cfg, layer, x, "ragged")

    # weight-traffic floor: all-touched experts' packed bytes at HBM SOL
    bytes_layer = sum(int(np.prod(layer[k].data.shape))
                      for k in ("moe_w1", "moe_w3", "moe_w2"))
    floor = bytes_layer / 819e9
    print(f"all-expert packed bytes/layer: {bytes_layer/1e6:.0f} MB "
          f"-> DMA floor {floor*1e3:.2f} ms", flush=True)
    pick = "dense-masked" if dense <= ragged else "ragged"
    print(f"decode path pick (M={m}): {pick} "
          f"(dense {dense*1e3:.2f} vs ragged {ragged*1e3:.2f} ms; "
          f"floor {floor*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
