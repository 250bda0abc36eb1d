"""Generation utilities outside the serving engine: beam search.

The engine's continuous-batching loop is sampling-only (the production
path); beam search is the offline/eval counterpart — find a high-
loglikelihood completion by keeping `n_beams` hypotheses and expanding
the best `score + log p(token)` candidates each step.

TPU shape: all beams ride ONE [n_beams] decode batch (the same jitted
`decode_step` the engine uses, KV cache batch axis = beams); beam
reordering gathers the cache along the batch axis once per step.  The
scoring/bookkeeping runs host-side per step — this is an offline
utility, not the serving hot path.

GNMT length penalty: finished hypotheses rank by
`logprob / ((5 + len) / 6) ** alpha`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M

__all__ = ["beam_search", "BeamHypothesis"]


@dataclasses.dataclass
class BeamHypothesis:
    tokens: List[int]          # generated tokens (no prompt, no EOS)
    logprob: float             # sum of token logprobs (incl. EOS if hit)
    score: float               # length-penalized ranking score


def _gather_batch(cache, idx):
    """Reorder every cache leaf's batch axis (axis 1) by `idx`."""
    return jax.tree.map(lambda a: a[:, idx], cache)


def beam_search(cfg, params, prompt: Sequence[int], *, n_beams: int = 4,
                max_new_tokens: int = 64, eos_token: int = -1,
                length_penalty: float = 0.0, max_len: Optional[int] = None,
                ) -> List[BeamHypothesis]:
    """Beam-search completion of `prompt`; returns hypotheses sorted by
    score (best first).  n_beams=1 reproduces greedy decoding exactly."""
    if not prompt:
        raise ValueError("prompt must be non-empty")
    nb = n_beams
    plen = len(prompt)
    max_len = max_len or min(cfg.max_seq_len, plen + max_new_tokens)
    if plen + max_new_tokens > max_len:
        raise ValueError(f"prompt {plen} + max_new {max_new_tokens} "
                         f"exceeds max_len {max_len}")
    cache = M.init_kv_cache(cfg, nb, max_len=max_len)
    rows = jnp.broadcast_to(jnp.asarray(prompt, jnp.int32)[None], (nb, plen))
    logits, cache = jax.jit(M.prefill, static_argnums=0)(cfg, params, rows,
                                                         cache)
    step_fn = jax.jit(M.decode_step, static_argnums=0)

    def lpnorm(length: int) -> float:
        return ((5.0 + length) / 6.0) ** length_penalty

    lp0 = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]
    order = np.argsort(-lp0)[:nb]
    scores = lp0[order].astype(np.float64)    # [nb] running logprobs
    beams: List[List[int]] = [[int(t)] for t in order]
    tok = jnp.asarray([int(t) for t in order], jnp.int32)
    pos = jnp.full((nb,), plen, jnp.int32)
    finished: List[BeamHypothesis] = []
    alive = np.ones((nb,), bool)

    for i, t in enumerate(order):           # first token may already be EOS
        if eos_token >= 0 and int(t) == eos_token:
            finished.append(BeamHypothesis([], scores[i],
                                           scores[i] / lpnorm(1)))
            scores[i] = -np.inf
            alive[i] = False

    for step in range(1, max_new_tokens):
        if not alive.any():
            break
        logits, cache = step_fn(cfg, params, tok, pos, cache)
        lp = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
        cand = scores[:, None] + lp          # dead rows are -inf
        flat = cand.reshape(-1)
        # top nb continuations + up to nb EOS finalizations per step
        top = np.argpartition(-flat, min(2 * nb, flat.size - 1))[:2 * nb]
        top = top[np.argsort(-flat[top])]
        new_beams, new_scores, src, toks = [], [], [], []
        for c in top:
            b, t = divmod(int(c), lp.shape[1])
            if not np.isfinite(flat[c]):
                continue
            if eos_token >= 0 and t == eos_token:
                finished.append(BeamHypothesis(
                    list(beams[b]), float(flat[c]),
                    float(flat[c]) / lpnorm(step + 1)))
                continue
            if len(new_beams) < nb:
                new_beams.append(beams[b] + [t])
                new_scores.append(float(flat[c]))
                src.append(b)
                toks.append(t)
        if not new_beams:
            break
        # early stop: the best alive score cannot beat the worst kept
        # finished score once we have nb finished (standard is_done rule)
        if len(finished) >= nb:
            best_alive = max(new_scores) / lpnorm(plen + max_new_tokens)
            worst_kept = sorted((h.score for h in finished),
                                reverse=True)[nb - 1]
            if best_alive < worst_kept:
                break
        while len(new_beams) < nb:           # pad with a dead copy of row 0
            new_beams.append(new_beams[0])
            new_scores.append(-np.inf)
            src.append(src[0])
            toks.append(toks[0])
        beams = new_beams
        scores = np.asarray(new_scores, np.float64)
        alive = np.isfinite(scores)
        cache = _gather_batch(cache, jnp.asarray(src, jnp.int32))
        tok = jnp.asarray(toks, jnp.int32)
        pos = pos + 1

    for i in range(nb):                      # finalize still-alive beams
        if alive[i]:
            finished.append(BeamHypothesis(
                list(beams[i]), float(scores[i]),
                float(scores[i]) / lpnorm(len(beams[i]))))
    finished.sort(key=lambda h: -h.score)
    return finished[:nb]
