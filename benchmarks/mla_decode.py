"""MLA decode benchmark: DeepSeek-V2-Lite ATTENTION geometry (the MLP is a
dense ~2.6B proxy — real V2-Lite is MoE), INT4 weights, INT8
latent KV cache, absorbed-weight decode (one chip).

The latent cache makes decode attention traffic per position
R + rope (≈0.6 KB) instead of 2*H*head_dim (4 KB dense INT8 at this
geometry) — this harness measures the end-to-end step time the same way as
benchmarks/decode_8b.py (chained steps, slope over step counts).

Usage: python benchmarks/mla_decode.py [batch] [context_len]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from piquant_tpu.models import mla as L


def main(batch=8, ctx=1024, max_len=2048):
    cfg = L.v2_lite_config()
    print(f"building INT4 V2-Lite MLA params (batch={batch}, ctx={ctx})...",
          flush=True)
    params = L.random_quantized_params(cfg, jax.random.key(0), bits=4,
                                       lm_head_bits=8)
    kk = jax.random.key(2)
    cache = L.LatentKVCache(
        c_codes=jax.random.randint(
            jax.random.fold_in(kk, 0),
            (cfg.n_layers, batch, max_len, cfg.kv_lora_rank), -127, 128,
            jnp.int32).astype(jnp.int8),
        c_scale=jnp.full((cfg.n_layers, batch, max_len, 1), 0.01, jnp.float32),
        k_pe=jax.random.normal(
            jax.random.fold_in(kk, 1),
            (cfg.n_layers, batch, max_len, cfg.qk_rope_head_dim),
            jnp.bfloat16),
        length=jnp.full((batch,), ctx, jnp.int32),
    )

    def chain(k):
        @jax.jit
        def run(p, tok, pos, c):
            def body(i, carry):
                tok, pos, c = carry
                logits, c = L.decode_step(cfg, p, tok, pos, c)
                return logits.argmax(-1).astype(jnp.int32), pos + 1, c
            tok, pos, c = jax.lax.fori_loop(0, k, body, (tok, pos, c))
            return tok
        return run

    tok0 = jnp.zeros((batch,), jnp.int32)
    pos0 = jnp.full((batch,), ctx, jnp.int32)
    f1, f2 = chain(4), chain(20)
    np.asarray(f1(params, tok0, pos0, cache)[:1])
    np.asarray(f2(params, tok0, pos0, cache)[:1])

    def t_of(f, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(params, tok0, pos0, cache)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (t_of(f2) - t_of(f1)) / 16
    latent_bytes = cfg.n_layers * batch * max_len * (cfg.kv_lora_rank + 4
                                                     + 2 * cfg.qk_rope_head_dim)
    dense_bytes = cfg.n_layers * batch * max_len * 2 * cfg.n_heads * cfg.v_head_dim
    print(f"decode: {per_step*1e3:.2f} ms/step -> "
          f"{batch/per_step:.1f} tok/s/chip, batch={batch}")
    print(f"latent cache {latent_bytes/1e9:.2f} GB vs dense-equivalent "
          f"{dense_bytes/1e9:.2f} GB ({dense_bytes/latent_bytes:.1f}x smaller)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
