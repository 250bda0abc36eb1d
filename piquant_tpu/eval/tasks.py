"""Loglikelihood task evaluation (lm-eval-harness style).

Completes the evaluation subsystem next to `eval/ppl.py`: multiple-choice
accuracy (HellaSwag/ARC/MMLU-shaped tasks) is scored as
`argmax_c  log p(choice_c | prompt)`, optionally length-normalized
(`acc_norm`).  Token-level like everything else in the framework — bring
your own tokenizer.

    lls = choice_loglikelihoods(cfg, params, prompt_ids, choices_ids)
    result = evaluate_choices(cfg, params, examples)   # accuracy + acc_norm

Batched + padded to a few fixed shapes so the whole task evaluates in a
handful of compiled programs (pad buckets are powers of two), and the
same function scores float and quantized params — quantization damage on
a task is an apples-to-apples delta like the ppl harness.

Reference anchor: extends SURVEY §5's evaluation row; the reference has
no eval story at all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M

__all__ = ["choice_loglikelihoods", "evaluate_choices", "ChoiceResult"]


@dataclasses.dataclass
class ChoiceResult:
    accuracy: float        # argmax of total choice loglikelihood
    accuracy_norm: float   # argmax of per-token (length-normalized) ll
    n: int
    loglikelihoods: List[List[float]]  # [example][choice]


def _bucket(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"sequence length {n} exceeds the largest pad bucket")


import functools


@functools.lru_cache(maxsize=None)
def _jit_ll(cfg):
    """One jitted scorer per config (shapes specialize per pad bucket x
    batch inside jit's own cache) — a fresh jit wrapper per call would
    retrace and recompile the full forward on every batch."""

    def run(p, tk, pl, tl):
        logits, _ = M.forward(cfg, p, tk)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tk[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[:, :, None], axis=-1)[:, :, 0]
        pos = jnp.arange(tok_lp.shape[1])[None, :]
        # token at position i is predicted by logits at i-1: target token
        # positions are [pl, pl+tl) -> predicted at [pl-1, pl+tl-1)
        mask = (pos >= pl[:, None] - 1) & (pos < (pl + tl)[:, None] - 1)
        return jnp.sum(tok_lp * mask, axis=1)

    return jax.jit(run)


def _ll_batch(cfg, params, toks, plens, tlens):
    """Sum log p(target tokens) for rows of [prompt || target || pad].

    toks [B, T] int32; plens/tlens [B]: target positions are
    [plen, plen + tlen).  Conditioning is strictly causal, so one forward
    scores the whole continuation."""
    return _jit_ll(cfg)(params, toks, plens, tlens)


def choice_loglikelihoods(cfg, params, prompt: Sequence[int],
                          choices: Sequence[Sequence[int]]) -> List[float]:
    """log p(choice | prompt) for each tokenized choice continuation."""
    rows, plens, tlens = _pad_rows([(list(prompt), list(c)) for c in choices])
    return [float(v) for v in _ll_batch(cfg, params, rows, plens, tlens)]


def _pad_rows(pairs: List[Tuple[List[int], List[int]]]):
    lens = [len(p) + len(t) for p, t in pairs]
    width = _bucket(max(lens))
    rows = np.zeros((len(pairs), width), np.int32)
    plens = np.zeros((len(pairs),), np.int32)
    tlens = np.zeros((len(pairs),), np.int32)
    for i, (p, t) in enumerate(pairs):
        if not p or not t:
            raise ValueError("prompt and choice must both be non-empty")
        rows[i, : len(p) + len(t)] = np.asarray(p + t, np.int32)
        plens[i] = len(p)
        tlens[i] = len(t)
    return jnp.asarray(rows), jnp.asarray(plens), jnp.asarray(tlens)


def evaluate_choices(cfg, params, examples, batch_size: int = 32
                     ) -> ChoiceResult:
    """examples: iterable of (prompt_ids, [choice_ids, ...], answer_idx).

    Flattens every (example, choice) pair into padded batches (one compiled
    program per pad bucket x batch shape), scores them causally, and
    reports accuracy (total ll) and acc_norm (per-token ll)."""
    examples = list(examples)
    flat: List[Tuple[List[int], List[int]]] = []
    spans = []
    for prompt, choices, _ in examples:
        spans.append((len(flat), len(choices)))
        flat.extend((list(prompt), list(c)) for c in choices)

    lls = np.zeros((len(flat),), np.float64)
    tlen_all = np.asarray([len(t) for _, t in flat], np.float64)
    # group by pad bucket so each batch is one compiled shape
    order = sorted(range(len(flat)),
                   key=lambda i: _bucket(len(flat[i][0]) + len(flat[i][1])))
    for s in range(0, len(order), batch_size):
        idx = order[s:s + batch_size]
        # pad the straggler batch to batch_size with a repeat of row 0
        # (scored but discarded) so shapes stay canonical
        pad_to = batch_size if len(order) >= batch_size else len(idx)
        padded = idx + [idx[0]] * (pad_to - len(idx))
        rows, plens, tlens = _pad_rows([flat[i] for i in padded])
        out = np.asarray(_ll_batch(cfg, params, rows, plens, tlens))
        for j, i in enumerate(idx):
            lls[i] = out[j]

    correct = correct_norm = 0
    per_example: List[List[float]] = []
    for (start, n), (_, _, ans) in zip(spans, examples):
        ll = lls[start:start + n]
        per_example.append([float(v) for v in ll])
        if int(np.argmax(ll)) == ans:
            correct += 1
        if int(np.argmax(ll / tlen_all[start:start + n])) == ans:
            correct_norm += 1
    n = len(examples)
    return ChoiceResult(accuracy=correct / n, accuracy_norm=correct_norm / n,
                        n=n, loglikelihoods=per_example)
