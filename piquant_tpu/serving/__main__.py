"""Serving CLI:  python -m piquant_tpu.serving [options]

Loads an HF checkpoint (or builds a random model), quantizes weights, and
either serves prompts from the command line / stdin or runs a synthetic
load benchmark through the continuous-batching engine.

Examples:
  python -m piquant_tpu.serving --model /path/to/llama --bits 4 "Hello"
  python -m piquant_tpu.serving --random tiny --benchmark 16
  echo "prompt" | python -m piquant_tpu.serving --model /path/to/llama
"""

from __future__ import annotations

import argparse
import sys
import time


def _bits_arg(v: str):
    """--bits value: int width or a codebook name ('nf4')."""
    return v if v == "nf4" else int(v)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="python -m piquant_tpu.serving",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("prompts", nargs="*", help="prompts (token ids if --random)")
    ap.add_argument("--model", help="HF checkpoint path (needs transformers)")
    ap.add_argument("--random", metavar="PRESET",
                    choices=["tiny", "llama3_8b", "mistral_7b", "qwen2_7b",
                             "gemma_2b", "gemma_7b", "phi3_mini", "mixtral_8x7b",
                             "qwen3_8b", "qwen3_moe_a3b", "gemma2_9b", "gemma3_12b", "gpt_oss_20b", "llama4_scout",
                             "mla_v2_lite", "mla_tiny", "mla_v2_moe"],
                    help="random-weight model preset instead of --model")
    ap.add_argument("--bits", type=_bits_arg, default=4,
                    choices=[2, 4, 8, "nf4"],
                    help="weight quantization: bits or 'nf4' (default 4)")
    ap.add_argument("--kv-bits", type=int, default=8, choices=[4, 8],
                    help="KV-cache code width (4: half the cache bytes)")
    ap.add_argument("--mlp-bits", type=_bits_arg, default=None,
                    choices=[2, 4, 8, "nf4"],
                    help="mixed precision: quantize w1/w2/w3 at this width "
                         "(attention keeps --bits)")
    ap.add_argument("--mlp-group-size", type=int, default=None,
                    help="group size for the --mlp-bits weights")
    ap.add_argument("--group-size", type=int, default=None,
                    help="group-wise quantization group size")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--min-p", type=float, default=0.0,
                    help="keep tokens with p >= min_p * p_max")
    ap.add_argument("--repetition-penalty", type=float, default=1.0,
                    help="HF/CTRL repetition penalty over prompt+generated "
                         "(enables the device-side token history)")
    ap.add_argument("--prefill-chunk", type=int, default=None)
    ap.add_argument("--attn-windows", default=None,
                    help="comma-separated attention-window bucket ladder "
                         "(e.g. 512,1024,2048); buckets are warmed at "
                         "startup — measured +18%% decode tok/s at mixed "
                         "contexts")
    ap.add_argument("--act-quant-prefill", action="store_true",
                    help="W4A8: int8 per-token activations for prefill "
                         "matmuls (1.85x MXU rate, ~+0.002 ppl)")
    ap.add_argument("--act-quant-decode", action="store_true",
                    help="int8 activations at every M incl. decode "
                         "(the INT2 fast path: int8-plane kernel)")
    ap.add_argument("--speculate", type=int, default=0,
                    help="speculative decoding: drafts per verify step "
                         "(prompt-lookup by default; see --draft-bits)")
    ap.add_argument("--draft-bits", type=_bits_arg, default=None,
                    choices=[2, 4, 8, "nf4"],
                    help="two-model speculation: draft = this model "
                         "re-quantized at the given width (high agreement "
                         "with the target => high acceptance); greedy "
                         "verify or exact rejection sampling at "
                         "temperature>0.  Needs --speculate")
    ap.add_argument("--draft-group-size", type=int, default=None)
    ap.add_argument("--benchmark", type=int, metavar="N", default=None,
                    help="run a synthetic N-request load benchmark and print "
                         "engine metrics JSON")
    ap.add_argument("--metrics-out", help="append engine metrics JSON line here")
    ap.add_argument("--serve", type=int, metavar="PORT", default=None,
                    help="start the HTTP front-end (serving/server.py: "
                         "/v1/completions with SSE streaming, /v1/metrics) "
                         "on this port and block")
    return ap


def _mlp_overrides(args):
    """--mlp-bits/--mlp-group-size -> quantize_params `overrides` for the
    MLP projections (the ~75%-of-layer-bytes mixed-precision knob:
    attn-int4 + mlp-int2-g32 was +2.06 ppl vs +3.57 all-int2 on the
    proxy).  None = uniform quantization."""
    if args.mlp_bits is None and args.mlp_group_size is None:
        return None
    bits = args.mlp_bits if args.mlp_bits is not None else args.bits
    gs = args.mlp_group_size
    return {k: (bits, gs) for k in ("w1", "w3", "w2")}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit platform choice at the CONFIG level too: the
        # env var alone does not stop a registered remote-TPU plugin from
        # blocking at first backend use when its relay is down (NOTES.md)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
    import numpy as np

    from piquant_tpu.models import llama as M
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    import dataclasses

    tok = None
    if args.model:
        from transformers import AutoTokenizer

        from piquant_tpu.models.loader import load_from_hf

        tok = AutoTokenizer.from_pretrained(args.model)
        cfg, params = load_from_hf(args.model, quantize_bits=None)
        params = M.quantize_params(params, bits=args.bits,
                                   group_size=args.group_size,
                                   overrides=_mlp_overrides(args))
    else:
        preset = args.random or "tiny"
        if preset.startswith("mla_"):
            # MLA (DeepSeek-V2-style latent attention) through the same
            # engine: latent INT8 cache, absorbed-weight decode
            from piquant_tpu.models import mla as ML

            if preset == "mla_v2_lite":
                cfg = ML.v2_lite_config()
                params = ML.random_quantized_params(cfg, jax.random.key(0),
                                                    bits=args.bits,
                                                    lm_head_bits=8)
            elif preset == "mla_v2_moe":
                # full DeepSeek-V2 geometry: MoE-MLA + yarn (tiny scale)
                cfg = ML.MLAConfig.tiny_moe(vocab=2048)
                params = ML.quantize_params(
                    ML.init_params(cfg, jax.random.key(0)), bits=args.bits)
            else:
                cfg = ML.MLAConfig.tiny(vocab=2048)
                params = ML.random_quantized_params(cfg, jax.random.key(0),
                                                    bits=args.bits,
                                                    lm_head_bits=8)
        elif preset in ("llama3_8b", "mistral_7b", "qwen2_7b", "gemma_7b",
                        "phi3_mini", "mixtral_8x7b", "qwen3_8b",
                        "qwen3_moe_a3b", "gemma2_9b", "gemma3_12b",
                        "gpt_oss_20b", "llama4_scout"):
            cfg = getattr(M.LlamaConfig, preset)()
            params = M.random_quantized_params(cfg, jax.random.key(0),
                                               bits=args.bits, lm_head_bits=8)
        else:
            cfg = getattr(M.LlamaConfig, preset)()
            params = M.quantize_params(M.init_params(cfg, jax.random.key(0)),
                                       bits=args.bits,
                                       group_size=args.group_size,
                                       overrides=_mlp_overrides(args))

    if args.kv_bits != 8 and hasattr(cfg, "kv_bits"):
        cfg = dataclasses.replace(cfg, kv_bits=args.kv_bits)
    if args.act_quant_prefill and hasattr(cfg, "act_quant_prefill"):
        cfg = dataclasses.replace(cfg, act_quant_prefill=True)
    if args.act_quant_decode and hasattr(cfg, "act_quant_decode"):
        cfg = dataclasses.replace(cfg, act_quant_decode=True)
    windows = (tuple(int(w) for w in args.attn_windows.split(","))
               if args.attn_windows else ())
    ec = EngineConfig(batch_slots=args.slots, max_seq_len=args.max_seq_len,
                      prefill_chunk=args.prefill_chunk,
                      speculate=args.speculate, attn_windows=windows,
                      track_history=args.repetition_penalty != 1.0)
    draft = None
    if args.draft_bits is not None:
        if args.speculate <= 0:
            raise SystemExit("--draft-bits needs --speculate > 0")
        print(f"building {args.draft_bits}-bit draft model "
              "(requantize_params)...", flush=True)
        draft = (cfg, M.requantize_params(params, args.draft_bits,
                                          group_size=args.draft_group_size))
    eng = Engine(cfg, params, ec, draft=draft)
    eos = getattr(tok, "eos_token_id", None) if tok else None
    sp = SamplingParams(temperature=args.temperature, top_k=args.top_k,
                        top_p=args.top_p, min_p=args.min_p,
                        repetition_penalty=args.repetition_penalty,
                        max_new_tokens=args.max_new,
                        eos_token=eos if eos is not None else -1)

    if args.serve is not None:
        from piquant_tpu.serving import EngineServer

        srv = EngineServer(eng, host="0.0.0.0", port=args.serve)
        srv.start()
        print(f"serving on http://{srv.host}:{srv.port} "
              f"(POST /v1/completions, GET /v1/metrics)", flush=True)
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0

    if args.benchmark:
        rng = np.random.default_rng(7)
        t0 = time.perf_counter()
        hi = max(66, min(900, args.max_seq_len - args.max_new))
        for i in range(args.benchmark):
            plen = int(rng.integers(min(64, hi - 1), hi))
            eng.submit(Request(rid=i,
                               prompt=rng.integers(5, cfg.vocab_size - 5,
                                                   plen).tolist(),
                               sampling=sp))
        done = eng.run()
        wall = time.perf_counter() - t0
        import json

        m = eng.metrics.to_dict()
        m["wall_s"] = round(wall, 2)
        m["completed"] = len(done)
        print(json.dumps(m))
        if args.metrics_out:
            eng.metrics.emit(args.metrics_out)
        return 0

    raw = args.prompts or [l.strip() for l in sys.stdin if l.strip()]
    if not raw:
        print("no prompts (pass as args or stdin); see --help", file=sys.stderr)
        return 2
    for i, text in enumerate(raw):
        ids = tok.encode(text) if tok else [int(t) for t in text.split(",")]
        eng.submit(Request(rid=i, prompt=ids, sampling=sp))
    for r in sorted(eng.run(), key=lambda r: r.rid):
        out = tok.decode(r.tokens) if tok else r.tokens
        print(f"[{r.rid}] ttft={r.ttft_s*1e3:.0f}ms | {out}")
    if args.metrics_out:
        eng.metrics.emit(args.metrics_out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
