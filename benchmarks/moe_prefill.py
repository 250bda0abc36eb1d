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


def build(key, group_size=None):
    from functools import partial

    @partial(jax.jit, static_argnums=(1, 2))
    def one(k_, kin, nout):
        return quantize_linear_weight(
            jax.random.normal(k_, (kin, nout), jnp.float32) * 0.02, bits=4,
            group_size=group_size)

    def stack(k_, kin, nout):
        s = QuantizedExpertStack.stack(
            [one(jax.random.fold_in(k_, i), kin, nout) for i in range(E)])
        jax.block_until_ready(s.data)
        print(f"  built stack {kin}x{nout} gs={group_size}", flush=True)
        return s

    layer = {
        "router": jax.random.normal(key, (D_MODEL, E), jnp.float32) * 0.02,
        "moe_w1": stack(jax.random.fold_in(key, 1), D_MODEL, D_FF),
        "moe_w3": stack(jax.random.fold_in(key, 2), D_MODEL, D_FF),
        "moe_w2": stack(jax.random.fold_in(key, 3), D_FF, D_MODEL),
    }
    return layer


def bench(cfg, layer, x, label):
    # In-jit fori chain with a data dependence and a DYNAMIC trip count
    # (ONE compile per variant), params as ARGUMENTS (a closed-over layer
    # dict lowers its weights as MLIR constants = full device->host
    # round-trip at lowering, the "compile hang"; NOTES.md).  Per-dispatch
    # slope timing is useless here — the relay costs ~28 ms per dispatch
    # round-trip, swamping the device time.
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

    per = (t_of(8) - t_of(2)) / 6
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

    os.environ["PIQUANT_MOE_RAGGED"] = "1"
    import jax.numpy as _jnp

    from piquant_tpu.models.llama import _moe_ragged_try
    probs = jax.nn.softmax(jnp.einsum(
        "btd,de->bte", x.astype(jnp.float32),
        layer["router"].astype(jnp.float32)), -1)
    pp, ti = jax.lax.top_k(probs, TOPK)
    chk = _moe_ragged_try(cfg, layer, x, pp / pp.sum(-1, keepdims=True), ti)
    assert chk is not None, "ragged path refused — fix the gate conditions"
    print("ragged path engaged:", chk.shape, flush=True)

    os.environ["PIQUANT_MOE_RAGGED"] = "0"
    dense = bench(cfg, layer, x, "dense")
    os.environ["PIQUANT_MOE_RAGGED"] = "1"
    ragged = bench(cfg, layer, x, "ragged")
    print(f"speedup: {dense/ragged:.2f}x (FLOP bound {E/TOPK:.1f}x)", flush=True)

    if os.environ.get("PIQUANT_MOE_VARIANTS", "all") == "all":
        # W4A8 ragged: int8 activations, exact int32 MXU dots (1.85x rate)
        cfg_a8 = dataclasses.replace(cfg, act_quant_prefill=True)
        a8 = bench(cfg_a8, layer, x, "ragged-a8")
        print(f"a8 speedup over ragged: {ragged/a8:.2f}x", flush=True)

        # grouped-scale (g32) ragged: in-register dequant kernel
        layer_g = build(jax.random.key(1), group_size=32)
        g32 = bench(cfg, layer_g, x, "ragged-g32")
        print(f"g32 cost over channelwise ragged: {g32/ragged:.2f}x",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
