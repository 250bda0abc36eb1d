"""Demo: load an HF Llama/Qwen2/Mistral checkpoint, quantize to INT4, and
generate with the continuous-batching engine.

    python examples/generate.py <hf-model-path> "prompt one" "prompt two"

Without a path it builds a tiny random model so the pipeline can be
exercised offline.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax


def main():
    from piquant_tpu.models import llama as M
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    args = sys.argv[1:]
    if args and not args[0].startswith("-"):
        from transformers import AutoTokenizer

        from piquant_tpu.models.loader import load_from_hf

        path, prompts = args[0], args[1:] or ["Hello"]
        tok = AutoTokenizer.from_pretrained(path)
        cfg, params = load_from_hf(path, quantize_bits=4)
        encoded = [tok.encode(p) for p in prompts]
    else:
        tok = None
        cfg = M.LlamaConfig.tiny()
        params = M.quantize_params(M.init_params(cfg, jax.random.key(0)), bits=4)
        encoded = [[1, 2, 3, 4], [9, 8, 7]]
        prompts = [str(e) for e in encoded]

    eng = Engine(cfg, params, EngineConfig(batch_slots=4,
                                           max_seq_len=min(2048, cfg.max_seq_len)))
    for i, toks in enumerate(encoded):
        eng.submit(Request(rid=i, prompt=toks,
                           sampling=SamplingParams(max_new_tokens=32,
                                                   temperature=0.7)))
    for r in sorted(eng.run(), key=lambda r: r.rid):
        text = tok.decode(r.tokens) if tok else str(r.tokens)
        print(f"[{r.rid}] ttft={r.ttft_s*1e3:.0f}ms | {prompts[r.rid]!r} -> {text!r}")
    m = eng.metrics
    print(f"-- {m.decode_tokens_per_s:.1f} decode tok/s, p50 TTFT {m.p50_ttft_ms():.0f} ms")


if __name__ == "__main__":
    main()
