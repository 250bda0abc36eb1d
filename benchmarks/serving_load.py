"""Serving-load benchmark: continuous-batching engine on one chip.

Submits a stream of requests (mixed prompt lengths) to the Engine and
reports p50/p99 TTFT and decode tokens/s — the BASELINE serving metrics,
measured through the real scheduler path (admission, slot-wise prefill,
fused decode+sample step).

Usage: python benchmarks/serving_load.py [n_requests] [batch_slots]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from piquant_tpu.models import llama as M
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams


def main(n_requests=16, slots=8):
    import dataclasses
    import os
    cfg = M.LlamaConfig.llama3_8b()
    if os.environ.get("PIQUANT_AQ_DECODE", "0") == "1":
        cfg = dataclasses.replace(cfg, act_quant_decode=True)
    windows = tuple(int(w) for w in
                    os.environ.get("PIQUANT_WINDOWS", "").split(",") if w)
    bits = int(os.environ.get("PIQUANT_BITS", "4"))
    print(f"building INT{bits} 8B params ({n_requests} requests, {slots} slots)...",
          flush=True)
    lmh = int(os.environ.get("PIQUANT_LMHEAD_BITS", "8"))
    params = M.random_quantized_params(cfg, jax.random.key(0), bits=bits,
                                       lm_head_bits=lmh)
    if os.environ.get("PIQUANT_FUSE", "0") == "1":
        params = M.fuse_layer_projections(params, cfg)
    dblk = int(os.environ.get("PIQUANT_DECODE_BLOCK", "0")) or 16
    eng = Engine(cfg, params, EngineConfig(batch_slots=slots, max_seq_len=2048,
                                           prefill_pad=256, decode_block=dblk,
                                           attn_windows=windows))
    rng = np.random.default_rng(7)
    lengths = rng.integers(100, 900, n_requests)

    # warm the compiled shapes (prefill buckets x burst sizes + decode
    # step) so measured TTFT reflects steady-state serving, not XLA
    # compilation.  Burst admission keys the prefill executable on
    # (bucket, burst size); the engine truncates bursts to powers of two,
    # so warming {1,2,4,..,slots} x buckets covers every shape the
    # measured run can dispatch.
    warm = Engine(cfg, params, EngineConfig(batch_slots=slots, max_seq_len=2048,
                                            prefill_pad=256, decode_block=dblk,
                                            attn_windows=windows))
    buckets = sorted(set(int(-(-l // 256) * 256) for l in lengths))
    bq = 1
    while bq <= slots:
        for L in buckets:
            for r in range(bq):
                warm.submit(Request(rid=r, prompt=[5] * (L - 1),
                                    sampling=SamplingParams(max_new_tokens=2)))
            warm.run()
        bq *= 2
    del warm

    t0 = time.perf_counter()
    for i, L in enumerate(lengths):
        prompt = rng.integers(10, cfg.vocab_size - 10, int(L)).tolist()
        tmp = float(os.environ.get("PIQUANT_SERVE_TEMP", "0.7"))
        eng.submit(Request(rid=i, prompt=prompt,
                           sampling=SamplingParams(
                               temperature=tmp,
                               top_k=40 if tmp > 0 else 0,
                               max_new_tokens=128)))
    done = eng.run()
    wall = time.perf_counter() - t0

    m = eng.metrics.to_dict()
    total_new = sum(len(r.tokens) for r in done)
    print(f"requests: {len(done)}  prompt tokens: {int(lengths.sum())}  "
          f"new tokens: {total_new}")
    print(f"wall: {wall:.1f} s  ({total_new / wall:.0f} new tok/s incl. prefill)")
    print(f"p50 TTFT: {m['p50_ttft_ms']:.0f} ms   p99 TTFT: {m['p99_ttft_ms']:.0f} ms")
    print(f"decode tokens/s (active-slot): {m['decode_tokens_per_s']:.0f}")
    print(m)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
