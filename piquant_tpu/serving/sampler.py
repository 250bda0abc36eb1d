"""Token sampling: greedy / temperature / top-k / top-p, jit-friendly."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0   # 0 => greedy
    top_k: int = 0             # 0 => disabled
    top_p: float = 1.0         # 1 => disabled
    min_p: float = 0.0         # 0 => disabled; keep tokens with
                               # p >= min_p * p_max (full-softmax probs)
    repetition_penalty: float = 1.0  # 1 => disabled; HF/CTRL convention:
                                     # seen tokens' logits l>0 -> l/pen,
                                     # l<0 -> l*pen (prompt + generated)
    frequency_penalty: float = 0.0   # OpenAI-style: l -= fp * count(t)
                                     # over GENERATED tokens (needs
                                     # EngineConfig.track_history)
    presence_penalty: float = 0.0    # l -= pp * [t generated before]
    logit_bias: tuple = ()           # ((token_id, bias), ...) added to the
                                     # logits every step (track_history)
    max_new_tokens: int = 128
    min_new_tokens: int = 0    # suppress eos_token (logit -inf) until this
                               # many tokens generated (needs
                               # EngineConfig.track_history)
    eos_token: int = -1        # -1 => never stops on EOS
    stop_tokens: tuple = ()    # additional stop ids (Llama-3 eot etc.)
    stop_sequences: tuple = () # multi-token stop suffixes, e.g.
                               # ((13, 13), (774, 2)): the request finishes
                               # when its generated tokens END with one;
                               # the matched suffix is trimmed from
                               # Request.tokens (host-side check)


def sample(logits: Array, params: SamplingParams, key: Optional[Array],
           history: Optional[Array] = None) -> Array:
    """logits [B, V] -> tokens [B] (static params => one compiled variant
    per distinct SamplingParams, like the kernel dispatch elsewhere).
    `history` [B, S] token ids is required when repetition_penalty != 1
    (the stateless API has no implicit context)."""
    if params.repetition_penalty != 1.0:
        if history is None:
            raise ValueError("repetition_penalty needs `history` token ids")
        b = logits.shape[0]
        logits = apply_repetition_penalty(
            logits, jnp.asarray(history, jnp.int32),
            jnp.full((b,), history.shape[-1], jnp.int32),
            jnp.full((b,), params.repetition_penalty, jnp.float32))
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32) / params.temperature
    if params.min_p > 0.0:
        thresh = (jnp.max(l, axis=-1, keepdims=True)
                  + jnp.log(jnp.maximum(params.min_p, 1e-10)))
        l = jnp.where(l < thresh, -jnp.inf, l)
    if params.top_k > 0:
        kth = jnp.sort(l, axis=-1)[:, -params.top_k][:, None]
        l = jnp.where(l < kth, -jnp.inf, l)
    if params.top_p < 1.0:
        sorted_l = jnp.sort(l, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.argmax(cum >= params.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_l, cutoff_idx[:, None], axis=-1)
        l = jnp.where(l < cutoff, -jnp.inf, l)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


TOPK_CAND = 128  # top-k/top-p candidate window (see sample_batch docstring)


def apply_repetition_penalty(
    logits: Array,     # [B, V]
    hist: Array,       # [B, S] token history (prompt + generated)
    hist_len: Array,   # [B] valid entries in hist
    penalty: Array,    # [B] f32; 1.0 => no-op for that row
) -> Array:
    """HF/CTRL repetition penalty: for every token id present in the
    row's history, logit l -> l/penalty if l > 0 else l*penalty.
    One [B, V] scatter per call — cheap next to the decode matmuls."""
    b, v = logits.shape
    s = hist.shape[1]
    valid = jnp.arange(s, dtype=jnp.int32)[None, :] < hist_len[:, None]
    ids = jnp.where(valid, hist, v)  # invalid entries scatter off the end
    seen = jnp.zeros((b, v + 1), jnp.bool_).at[
        jnp.arange(b)[:, None], ids].set(True)[:, :v]
    l = logits.astype(jnp.float32)
    pen = penalty[:, None]
    penalized = jnp.where(l > 0, l / pen, l * pen)
    return jnp.where(seen & (pen != 1.0), penalized, l)


def apply_freq_presence(
    logits: Array,     # [B, V]
    hist: Array,       # [B, S] token history (prompt + generated)
    start: Array,      # [B] first GENERATED index in hist (= prompt len)
    hist_len: Array,   # [B] valid entries in hist
    freq: Array,       # [B] f32 frequency penalty (0 => no-op)
    presence: Array,   # [B] f32 presence penalty (0 => no-op)
) -> Array:
    """OpenAI-style penalties over the GENERATED tokens only:
    l[t] -= freq * count(t) + presence * [count(t) > 0].
    Counts come from one [B, S] scatter-add into a [B, V+1] buffer —
    same cost class as apply_repetition_penalty."""
    b, v = logits.shape
    s = hist.shape[1]
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    gen = (pos >= start[:, None]) & (pos < hist_len[:, None])
    ids = jnp.where(gen, hist, v)  # non-generated entries scatter off-end
    counts = jnp.zeros((b, v + 1), jnp.float32).at[
        jnp.arange(b)[:, None], ids].add(1.0)[:, :v]
    l = logits.astype(jnp.float32)
    return l - freq[:, None] * counts - presence[:, None] * (counts > 0)


def sample_batch(
    logits: Array,       # [B, V]
    temperature: Array,  # [B] f32; <= 0 => greedy for that row
    top_k: Array,        # [B] i32; 0 => disabled (capped at TOPK_CAND)
    top_p: Array,        # [B] f32; >= 1 => disabled
    key: Array,
    min_p: Optional[Array] = None,  # [B] f32; <= 0 => disabled
) -> Array:
    """Per-row sampling params as TRACED arrays -> one compiled variant
    serves every mix of per-slot settings (the continuous-batching engine
    calls this once per decode step; per-request `SamplingParams` changes
    never trigger a recompile).

    A full-vocab sort costs tens of ms at V=128k on TPU, so order statistics
    are computed inside a `lax.top_k(TOPK_CAND)` candidate window: top-k is
    exact for k <= TOPK_CAND, and the top-p nucleus is truncated at
    TOPK_CAND candidates (it only differs when >128 tokens are needed to
    reach the requested mass — a regime where truncation is the standard
    serving behavior anyway).  Pure-temperature rows (k=0, p>=1) use exact
    full-vocab Gumbel sampling; greedy rows use exact argmax."""
    b, v = logits.shape
    c = min(TOPK_CAND, v)
    l = logits.astype(jnp.float32)
    greedy = temperature <= 0.0
    lt = l / jnp.maximum(temperature, 1e-6)[:, None]

    # exact paths (no order statistics needed)
    full_draw = jax.random.categorical(key, lt, axis=-1)
    arg = jnp.argmax(l, axis=-1)

    # candidate window for restricted rows
    cand, cand_idx = jax.lax.top_k(lt, c)              # [B, c] descending
    eff_k = jnp.clip(jnp.where(top_k > 0, top_k, c), 1, c)
    pos = jnp.arange(c, dtype=jnp.int32)[None, :]
    keep = pos < eff_k[:, None]

    probs = jax.nn.softmax(jnp.where(keep, cand, -jnp.inf), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # smallest prefix with mass >= p (p >= 1 -> whole window)
    nucleus = (cum - probs) < top_p[:, None]
    keep = keep & (nucleus | (top_p >= 1.0)[:, None])

    restricted = (top_k > 0) | (top_p < 1.0)
    if min_p is not None:
        # min-p on the FULL softmax: p(tok) >= min_p * p(argmax).  In
        # logit space: lt >= lt_max + log(min_p) — no normalizer needed.
        thresh = cand[:, :1] + jnp.log(jnp.maximum(min_p, 1e-10))[:, None]
        keep = keep & ((cand >= thresh) | (min_p <= 0.0)[:, None])
        restricted = restricted | (min_p > 0.0)

    masked = jnp.where(keep, cand, -jnp.inf)
    draw_c = jax.random.categorical(jax.random.fold_in(key, 1), masked, axis=-1)
    windowed = jnp.take_along_axis(cand_idx, draw_c[:, None], axis=-1)[:, 0]

    out = jnp.where(restricted, windowed, full_draw)
    return jnp.where(greedy, arg, out).astype(jnp.int32)
