"""INT4 Llama-3-8B decode benchmark on one chip (BASELINE headline).

Measures decode tokens/s/chip and prefill latency (TTFT proxy) on the real
Llama-3-8B geometry with randomly-initialized packed INT4 weights (values
don't affect bandwidth/latency).  Decode steps are chained inside one jit so
the tunnel dispatch overhead cancels (slope over step counts).

Usage: python benchmarks/decode_8b.py [batch] [context_len]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from piquant_tpu.models import llama as M


def main(batch=8, ctx=1024, max_len=2048):
    import os
    raw_bits = os.environ.get("PIQUANT_BITS", "4")
    bits = raw_bits if raw_bits == "nf4" else int(raw_bits)
    cfg = M.LlamaConfig.llama3_8b()
    import dataclasses
    if os.environ.get("PIQUANT_AQ_DECODE", "0") == "1":
        cfg = dataclasses.replace(cfg, act_quant_decode=True)
    kvb = int(os.environ.get("PIQUANT_KV_BITS", "8"))
    if kvb != 8:
        cfg = dataclasses.replace(cfg, kv_bits=kvb)
    print(f"building {raw_bits}-bit 8B params (batch={batch}, ctx={ctx})...",
          flush=True)
    gs = int(os.environ.get("PIQUANT_GS", "0")) or None
    # PIQUANT_MLP_BITS/_GS: the auto-mixed planner recipe (attn at BITS,
    # MLP at MLP_BITS — quant/mixed.py picks attn int4 + mlp int2-g32)
    mlp_bits = int(os.environ.get("PIQUANT_MLP_BITS", "0")) or None
    mlp_gs = int(os.environ.get("PIQUANT_MLP_GS", "0")) or None
    # PIQUANT_LMHEAD_BITS: lm_head code width (default int8 = 0.53 GB/step;
    # 4 halves that — quality cost on real weights TBD, traffic win ~0.3 ms)
    lmh_bits = int(os.environ.get("PIQUANT_LMHEAD_BITS", "8"))
    params = M.random_quantized_params(cfg, jax.random.key(0), bits=bits,
                                       lm_head_bits=lmh_bits, group_size=gs,
                                       mlp_bits=mlp_bits, mlp_group_size=mlp_gs)
    if os.environ.get("PIQUANT_FUSE", "0") == "1":
        # wqkv/w13 fusion: 7 -> 4 projections/layer.  r5 kernels: WINS
        # (9.26 -> 8.88 ms/step; the r2 '5% slower' verdict predated the
        # current weight-stream kernels) — best-known decode recipe
        params = M.fuse_layer_projections(params, cfg)
    cache = M.init_kv_cache(cfg, batch, max_len=max_len)

    # ---- prefill latency (the TTFT driver) -------------------------------
    # Whole-prompt prefill attention temporaries exceed HBM past B*ctx ~ 8k
    # on one chip (engine uses chunked/slot-wise prefill instead); larger
    # batches get a synthetic pre-filled cache and measure decode only.
    decode_only = os.environ.get("PIQUANT_DECODE_ONLY", "0") == "1"
    # PIQUANT_PREFILL=force: run whole-prompt prefill past the B*ctx ~ 8k
    # cap (sound with the flash-prefill path — no materialized scores);
    # PIQUANT_PREFILL_ONLY=1: exit after the prefill measurement.
    prefill_force = os.environ.get("PIQUANT_PREFILL", "") == "force"
    if (batch * ctx <= 8 * 1024 or prefill_force) and not decode_only:
        toks = jax.random.randint(jax.random.key(1), (batch, ctx), 0,
                                  cfg.vocab_size, jnp.int32)

        @jax.jit
        def prefill(p, t, c):
            return M.prefill(cfg, p, t, c)  # lm_head at last position only

        t0 = time.perf_counter()
        last, cache = prefill(params, toks, cache)
        np.asarray(last[:1, :1])
        t_prefill_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        last, cache2 = prefill(params, toks, cache)
        np.asarray(last[:1, :1])
        t_prefill = time.perf_counter() - t0
        print(f"prefill {batch}x{ctx}: {t_prefill*1e3:.0f} ms warm "
              f"({batch*ctx/t_prefill:.0f} tok/s prefill; cold {t_prefill_cold:.1f}s)",
              flush=True)
        last_tok = last.argmax(-1).astype(jnp.int32)
        if os.environ.get("PIQUANT_PREFILL_ONLY", "0") == "1":
            return
    else:
        print(f"synthetic pre-filled cache for batch={batch} (decode-only)", flush=True)
        kk = jax.random.key(2)
        shape = cache.k_codes.shape  # [L, B, H, S, D]
        cdt = cache.k_codes.dtype   # int8, or nibble-packed uint8 (kv4)

        @jax.jit
        def rnd_codes(k_):
            if cdt == jnp.uint8:    # kv4: any byte is a valid nibble pair
                return jax.random.randint(k_, shape, 0, 256,
                                          jnp.int32).astype(jnp.uint8)
            return jax.random.randint(k_, shape, -127, 128,
                                      jnp.int32).astype(cdt)

        from piquant_tpu.quant.kv_cache import KVCache
        cache = KVCache(
            k_codes=rnd_codes(jax.random.fold_in(kk, 0)),
            v_codes=rnd_codes(jax.random.fold_in(kk, 1)),
            # full_like keeps the layout right for both kv8 ([..,S,1])
            # and pair-packed kv4 ([..,2,S/2]) scale buffers
            k_scale=jnp.full_like(cache.k_scale, 0.01),
            v_scale=jnp.full_like(cache.v_scale, 0.01),
            length=jnp.full(cache.length.shape, ctx, jnp.int32),
        )
        last_tok = jnp.zeros((batch,), jnp.int32)

    # ---- decode tokens/s: chained steps, slope over K --------------------
    window = int(os.environ.get("PIQUANT_WINDOW", "0")) or None
    def chain(k):
        @jax.jit
        def run(p, tok, pos, c):
            def body(i, carry):
                tok, pos, c = carry
                logits, c = M.decode_step(cfg, p, tok, pos, c,
                                          attn_window=window)
                return logits.argmax(-1).astype(jnp.int32), pos + 1, c
            tok, pos, c = jax.lax.fori_loop(0, k, body, (tok, pos, c))
            return tok
        return run

    tok0 = last_tok
    pos0 = jnp.full((batch,), ctx, jnp.int32)
    f4, f20 = chain(4), chain(20)
    np.asarray(f4(params, tok0, pos0, cache)[:1])
    np.asarray(f20(params, tok0, pos0, cache)[:1])

    def t_of(f, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(params, tok0, pos0, cache)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (t_of(f20) - t_of(f4)) / 16
    print(f"decode: {per_step*1e3:.2f} ms/step -> "
          f"{batch/per_step:.1f} tok/s/chip total ({1/per_step:.1f} steps/s), "
          f"batch={batch}", flush=True)
    # weight-stream bound: 3.49 GB of packed weights per step
    print(f"weight-stream during decode: {3.49/per_step:.0f} GB/s "
          f"(HBM SOL would be {3.49/0.819:.2f} ms/step + cache/embed traffic)",
          flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    # Right-sized cache (argv[3], e.g. 1152 for ctx 1024 + decode headroom):
    # attention reads max_len slots every step, so a cache sized to the live
    # context instead of a 2048 worst-case halves decode cache traffic —
    # this is the honest serving config (the engine sizes per-request slots
    # from plen + max_new_tokens, serving/engine.py admission).
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    main(b, c, m)
