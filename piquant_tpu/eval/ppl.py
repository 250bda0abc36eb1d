"""Perplexity harness.

BASELINE acceptance metric: "INT4 Llama-3-8B decode within 0.1 ppl of bf16".
Evaluates chunked next-token NLL over a token stream with a sliding window;
the same function scores the float and quantized models so the ppl delta is
apples-to-apples.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M


def perplexity(cfg: M.LlamaConfig, params: Dict, tokens: Sequence[int], *,
               window: int = 512, stride: int = 256) -> float:
    """exp(mean NLL) over `tokens` with a sliding window.

    Each window scores only its last `stride` positions (the rest is
    context), the standard strided-perplexity protocol.
    """
    toks = np.asarray(tokens, np.int32)
    if toks.size < 2:
        raise ValueError("need at least 2 tokens")
    window = min(window, toks.size)

    @jax.jit
    def nll_of(p, chunk, score_from):
        # params are an ARGUMENT, not a closure capture: jit inlines
        # closed-over device arrays as MLIR constants, which round-trips
        # the full weights device->host at lowering time (NOTES.md — an
        # effective hang at 8B scale through the TPU relay)
        logits, _ = M.forward(cfg, p, chunk[None, :])
        lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
        tgt = chunk[1:]
        nll = -jnp.take_along_axis(lp, tgt[:, None], axis=-1)[:, 0]
        idx = jnp.arange(nll.shape[0])
        mask = idx >= score_from
        return jnp.sum(nll * mask), jnp.sum(mask)

    total, count = 0.0, 0
    for start in range(0, toks.size - 1, stride):
        end = min(start + window, toks.size)
        begin = max(0, end - window)          # fixed chunk length = window
        chunk = toks[begin:end]
        score_from = start - begin            # only new positions are scored
        s, c = nll_of(params, jnp.asarray(chunk), jnp.int32(score_from))
        total += float(s)
        count += int(c)
        if end == toks.size:
            break
    return float(np.exp(total / max(count, 1)))
