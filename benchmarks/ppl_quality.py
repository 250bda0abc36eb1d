"""Quantization-quality proxy for the BASELINE 0.1-ppl acceptance check.

No pretrained Llama weights exist in this environment (zero egress), so
this harness trains a small Llama on a synthetic but structured corpus
(nested arithmetic-progression sequences with noise) until it has real
predictive structure, then reports perplexity for bf16 vs INT8 / INT4
(channelwise and group-wise) through the same eval path the real check
would use (`piquant_tpu.eval.ppl`).

The DELTAS are the product: they measure quantization damage on a model
whose ppl is far from both 1.0 (memorized) and vocab-size (random).

Usage: python benchmarks/ppl_quality.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

# CPU proxy by design (tiny model; determinism > throughput).  Both settings
# are required: the shell env alone does not stop the axon plugin from
# blocking at import when the relay is down (NOTES.md session-5).
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import optax

from piquant_tpu.eval.ppl import perplexity
from piquant_tpu.models import llama as M

VOCAB = 512


def make_corpus(n_tokens: int, seed: int) -> np.ndarray:
    """Structured streams: arithmetic progressions mod VOCAB with occasional
    jumps — predictable enough to learn, noisy enough not to memorize."""
    rng = np.random.default_rng(seed)
    out = []
    while sum(len(s) for s in out) < n_tokens:
        start = int(rng.integers(0, VOCAB))
        step = int(rng.integers(1, 7))
        ln = int(rng.integers(16, 64))
        seq = (start + step * np.arange(ln)) % VOCAB
        if rng.random() < 0.3:  # noise token injection
            seq[rng.integers(0, ln)] = rng.integers(0, VOCAB)
        out.append(seq)
    return np.concatenate(out)[:n_tokens].astype(np.int32)


def main(steps: int = 400):
    cfg = M.LlamaConfig(
        vocab_size=VOCAB, d_model=256, n_layers=4, n_heads=8, n_kv_heads=4,
        d_ff=768, max_seq_len=256, dtype=jnp.float32,
    )
    params = M.init_params(cfg, jax.random.key(0))
    corpus = make_corpus(300_000, seed=1)
    B, T = 16, 128

    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, o, batch):
        def loss_fn(p_):
            logits, _ = M.forward(cfg, p_, batch[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(lp, batch[:, 1:, None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(2)
    t0 = time.perf_counter()
    for i in range(steps):
        starts = rng.integers(0, corpus.size - T - 1, B)
        batch = jnp.asarray(np.stack([corpus[s:s + T + 1] for s in starts]))
        params, opt_state, loss = train_step(params, opt_state, batch)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.3f}", flush=True)
    print(f"trained {steps} steps in {time.perf_counter()-t0:.0f}s "
          f"(final loss {float(loss):.3f})", flush=True)

    import dataclasses

    eval_toks = make_corpus(8_192, seed=9)
    # window >= ACT_QUANT_MIN_M so the W4A8 row actually engages act quant
    base = perplexity(cfg, params, eval_toks, window=512, stride=256)
    print(f"bf16/f32 ppl: {base:.4f}", flush=True)
    for name, kw, aq in [
        ("int8 channelwise", dict(bits=8), False),
        ("int4 channelwise", dict(bits=4), False),
        ("int4 group-wise gs=32", dict(bits=4, group_size=32), False),
        ("nf4 group-wise gs=64", dict(bits="nf4", group_size=64), False),
        ("nf4 group-wise gs=32", dict(bits="nf4", group_size=32), False),
        ("int4 + int8 act (W4A8)", dict(bits=4), True),
        ("int2 group-wise gs=32", dict(bits=2, group_size=32), False),
        ("int2 channelwise", dict(bits=2), False),
        ("int2 + int8 act (W2A8)", dict(bits=2), "decode"),
        ("mixed attn4 + mlp2-g32",
         dict(bits=4, overrides={"w1": (2, 32), "w3": (2, 32),
                                 "w2": (2, 32)}), False),
    ]:
        qp = M.quantize_params(params, **kw)
        if aq == "decode":  # act quant at every M (the INT2 decode path)
            c = dataclasses.replace(cfg, act_quant_decode=True)
        else:
            c = dataclasses.replace(cfg, act_quant_prefill=aq)
        ppl = perplexity(c, qp, eval_toks, window=512, stride=256)
        status = "PASS" if ppl - base <= 0.1 else "above-0.1"
        print(f"{name:24s} ppl: {ppl:.4f}  (delta {ppl-base:+.4f}) [{status}]",
              flush=True)

    # --- AWQ: activation-aware scaling folded into the norms (quant/awq) -
    from piquant_tpu.quant.awq import awq_quantize_params

    calib = jnp.asarray(
        np.stack([corpus[s:s + 256]
                  for s in rng.integers(0, corpus.size - 256, 8)]), jnp.int32)
    for name, bits, gs in [("int4-g32 + AWQ", 4, 32),
                           ("int2-g32 + AWQ", 2, 32),
                           ("int2 channelwise + AWQ", 2, None)]:
        qp = awq_quantize_params(cfg, params, calib, bits, group_size=gs)
        ppl = perplexity(cfg, qp, eval_toks, window=512, stride=256)
        status = "PASS" if ppl - base <= 0.1 else "above-0.1"
        print(f"{name:24s} ppl: {ppl:.4f}  (delta {ppl-base:+.4f}) [{status}]",
              flush=True)

    # --- auto-mixed precision: planner vs the hand recipe at the SAME
    # byte budget (quant/mixed.py greedy sensitivity knapsack) -------------
    from piquant_tpu.quant.mixed import plan_bytes, plan_mixed_precision

    hand = {}
    for li in range(cfg.n_layers):
        for k in ("wq", "wk", "wv", "wo"):
            hand[f"{li}.{k}"] = (4, None)
        for k in ("w1", "w3", "w2"):
            hand[f"{li}.{k}"] = (2, 32)
    budget = plan_bytes(params, hand)
    plan = plan_mixed_precision(cfg, params, calib, budget)
    qp = M.quantize_params(params, overrides=plan)
    ppl = perplexity(cfg, qp, eval_toks, window=512, stride=256)
    print(f"{'auto-mixed @ hand budget':24s} ppl: {ppl:.4f}  "
          f"(delta {ppl-base:+.4f}) [vs hand attn4+mlp2 above]", flush=True)

    # --- GPTQ: Hessian-compensated rounding (quant/gptq.py) --------------
    from piquant_tpu.quant.awq import apply_awq_scales, collect_activation_stats
    from piquant_tpu.quant.gptq import gptq_quantize_params

    from piquant_tpu.quant.rotate import rotate_params

    rot_params = rotate_params(cfg, params)
    for name, bits, gs, use_awq, use_rot in [
            ("int4-g32 + GPTQ", 4, 32, False, False),
            ("int2-g32 + GPTQ", 2, 32, False, False),
            ("int2-g32 + AWQ + GPTQ", 2, 32, True, False),
            ("int4-g32 + ROT + GPTQ", 4, 32, False, True),
            ("int2-g32 + ROT + GPTQ", 2, 32, False, True),
    ]:
        p_in = rot_params if use_rot else params
        if use_awq:
            stats = collect_activation_stats(cfg, params, calib)
            p_in = apply_awq_scales(cfg, params, stats, bits, group_size=gs)
        qp = gptq_quantize_params(cfg, p_in, calib, bits, group_size=gs)
        ppl = perplexity(cfg, qp, eval_toks, window=512, stride=256)
        status = "PASS" if ppl - base <= 0.1 else "above-0.1"
        print(f"{name:24s} ppl: {ppl:.4f}  (delta {ppl-base:+.4f}) [{status}]",
              flush=True)

    # --- QAT recovery for INT2: continue training THROUGH the 2-bit
    # fake-quant (STE) so the weights adapt to the code grid ---------------
    from piquant_tpu.quant.qat import fake_quant_model_weights

    @jax.jit
    def qat_step(p, o, batch):
        def loss_fn(p_):
            pq = fake_quant_model_weights(p_, bits=2, group_size=32)
            logits, _ = M.forward(cfg, pq, batch[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(lp, batch[:, 1:, None], axis=-1)
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    qat_params = params
    qat_opt = opt.init(qat_params)
    for i in range(steps):
        starts = rng.integers(0, corpus.size - T - 1, B)
        batch = jnp.asarray(np.stack([corpus[s:s + T + 1] for s in starts]))
        qat_params, qat_opt, loss = qat_step(qat_params, qat_opt, batch)
    q2 = M.quantize_params(qat_params, bits=2, group_size=32)
    ppl = perplexity(cfg, q2, eval_toks, window=512, stride=256)
    print(f"{'int2 gs=32 + QAT':24s} ppl: {ppl:.4f}  (delta {ppl-base:+.4f}) "
          f"[QAT recovery vs naive]", flush=True)

    # QAT adapts the float weights to the RTN grid; GPTQ then replaces the
    # final rounding with Hessian-compensated rounding — the two compose.
    q3 = gptq_quantize_params(cfg, qat_params, calib, 2, group_size=32)
    ppl = perplexity(cfg, q3, eval_toks, window=512, stride=256)
    print(f"{'int2-g32 + QAT + GPTQ':24s} ppl: {ppl:.4f}  "
          f"(delta {ppl-base:+.4f}) [compose]", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
