"""Decode-step budget decomposition (v5e, 8B geometry).

Times the full chained decode step, then variants with one component
surgically replaced by a shape-preserving pass-through (patched before
tracing).  The difference attributes ms/step to that component — the only
honest decomposition available here, since jax.profiler hangs through the
dev tunnel and sub-10ms absolute timings lie (NOTES.md).

  minus attention : PIQUANT_SKIP_ATTN=1 hook in models/llama.py (ctx := q;
                    skips scores/softmax/AV and all cache reads)
  minus kv append : kv_cache_append_stacked patched to identity
  minus matmuls   : quantized_matmul patched to broadcast-zeros (keeps a
                    data dependence on x; skips weight streaming + MXU)

Usage: PIQUANT_BITS=2 PIQUANT_AQ_DECODE=1 python benchmarks/decode_parts.py
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

BATCH, CTX, MAXLEN = 8, 1024, 2048


def build(cfg):
    params = M.random_quantized_params(
        cfg, jax.random.key(0),
        bits=int(os.environ.get("PIQUANT_BITS", "4")), lm_head_bits=8)
    cache = M.init_kv_cache(cfg, BATCH, max_len=MAXLEN)
    kk = jax.random.key(2)
    shape = cache.k_codes.shape
    from piquant_tpu.quant.kv_cache import KVCache

    def rnd(k_):
        return jax.random.randint(k_, shape, -127, 128, jnp.int32).astype(jnp.int8)

    cache = KVCache(
        k_codes=rnd(jax.random.fold_in(kk, 0)),
        v_codes=rnd(jax.random.fold_in(kk, 1)),
        k_scale=jnp.full(shape[:4] + (1,), 0.01, jnp.float32),
        v_scale=jnp.full(shape[:4] + (1,), 0.01, jnp.float32),
        length=jnp.full(cache.length.shape, CTX, jnp.int32),
    )
    return params, cache


def time_step(cfg, params, cache, label):
    def chain(k):
        @jax.jit
        def run(p, tok, pos, c):
            def body(i, carry):
                tok, pos, c = carry
                logits, c = M.decode_step(cfg, p, tok, pos, c)
                return logits.argmax(-1).astype(jnp.int32), pos + 1, c
            tok, pos, c = jax.lax.fori_loop(0, k, body, (tok, pos, c))
            return tok
        return run

    tok0 = jnp.zeros((BATCH,), jnp.int32)
    pos0 = jnp.full((BATCH,), CTX, jnp.int32)
    f1, f2 = chain(8), chain(72)
    np.asarray(f1(params, tok0, pos0, cache)[:1])
    np.asarray(f2(params, tok0, pos0, cache)[:1])

    def t_of(f):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(params, tok0, pos0, cache)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_of(f2) - t_of(f1)) / 64
    print(f"{label:20s} {per*1e3:7.2f} ms/step", flush=True)
    return per


def main():
    import dataclasses
    cfg = M.LlamaConfig.llama3_8b()
    if os.environ.get("PIQUANT_AQ_DECODE", "0") == "1":
        cfg = dataclasses.replace(cfg, act_quant_decode=True)
    params, cache = build(cfg)

    full = time_step(cfg, params, cache, "full step")

    os.environ["PIQUANT_SKIP_ATTN"] = "1"
    try:
        no_attn = time_step(cfg, params, cache, "minus attention")
    finally:
        os.environ["PIQUANT_SKIP_ATTN"] = "0"

    saved_app = M.kv_cache_append_stacked
    saved_batch = M.kv_cache_append_stacked_batch
    M.kv_cache_append_stacked = (
        lambda cache_, layer, k, v, positions, contiguous_start=None: cache_)
    M.kv_cache_append_stacked_batch = (
        lambda cache_, kc, ks, vc, vs, positions: cache_)
    try:
        no_app = time_step(cfg, params, cache, "minus kv append")
    finally:
        M.kv_cache_append_stacked = saved_app
        M.kv_cache_append_stacked_batch = saved_batch

    saved_qmm = M.quantized_matmul

    def qmm_zero(x, ql, out_dtype=jnp.bfloat16, **kw):
        lead = x.shape[:-1]
        # keep a LIVE data dependence on x (mul by 1e-12, not 0 — XLA
        # folds *0 under allow_excess_precision and dead-codes upstream)
        return (jnp.zeros((*lead, ql.n), out_dtype)
                + x[..., :1].astype(out_dtype) * out_dtype(1e-12))

    M.quantized_matmul = qmm_zero
    try:
        no_mm = time_step(cfg, params, cache, "minus matmuls")
    finally:
        M.quantized_matmul = saved_qmm

    print("-" * 44)
    print(f"attention    ~ {(full - no_attn)*1e3:6.2f} ms")
    print(f"kv append    ~ {(full - no_app)*1e3:6.2f} ms")
    print(f"matmuls      ~ {(full - no_mm)*1e3:6.2f} ms")
    rest = no_mm + no_attn + no_app - 2 * full
    print(f"other        ~ {rest*1e3:6.2f} ms (residual if independent)")


if __name__ == "__main__":
    main()
