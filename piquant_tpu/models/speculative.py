"""Prompt-lookup speculative decoding (device-side n-gram drafting).

Greedy decode emits one token per model call; with speculation the model
verifies G drafted continuation tokens in a single T=G+1 forward, emitting
1..G+1 tokens per call.  Drafts come from PROMPT LOOKUP: the most recent
earlier occurrence of the current bigram in the token history predicts the
continuation — no draft model, no extra weights, and the whole
draft->verify->accept loop runs ON DEVICE inside one `lax.scan`, so a
K-step speculative block costs exactly one dispatch like the normal decode
block.

Correctness invariant (tested): greedy speculative output is IDENTICAL to
greedy non-speculative output.  Rejected draft positions leave garbage K/V
in the cache and garbage entries in the history, but both sit at positions
strictly beyond the continuation point: attention masks them out until the
true tokens overwrite them.

Precision note: the identity is exact when the T=1 decode forward and the
T=G+1 verify forward reduce in the same order (TPU MXU tiling).  On CPU,
XLA lowers M=1 and M>1 matmuls differently (~1e-3 logit association
noise), which can flip a near-tie — observed only under the full Gemma-2
feature stack (softcap + sandwich norms + sliding pattern together); the
plain / MLA identity tests pass deterministically.

The reference (pi-quant) has no serving layer; this belongs to the
BASELINE serving slice built on its quantization primitives (the verify
forward runs the same INT4 fused-dequant matmuls and INT8 KV cache as
normal decode).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from piquant_tpu.models import llama as M

Array = jax.Array


def _verify_forward(cfg, params, tokens, positions, cache):
    """Model-generic T=G+1 verify forward returning FULL logits [B,T,V].

    Dense-KV (Llama-family) configs go through llama.forward; MLA configs
    through mla.forward_verify (absorbed path over the INT8 latent cache).
    Dispatch is trace-time — cfg is a static jit argument."""
    from piquant_tpu.models import mla as _mla
    if isinstance(cfg, _mla.MLAConfig):
        return _mla.forward_verify(cfg, params, tokens, positions, cache)
    return M.forward(cfg, params, tokens, positions=positions, cache=cache)


def ngram_draft(hist: Array, pos: Array, G: int) -> Array:
    """Draft G tokens per row by bigram prompt lookup.

    hist: [B, S] token history; entries at indices <= pos are valid and
    hist[b, pos[b]] is the current (already-emitted) token.
    Returns drafts [B, G] (zeros when no earlier bigram match exists —
    verification then simply rejects them)."""
    b, s = hist.shape
    j = jnp.arange(s, dtype=jnp.int32)[None, :]          # candidate end idx
    a_tok = jnp.take_along_axis(hist, jnp.maximum(pos - 1, 0)[:, None], 1)
    b_tok = jnp.take_along_axis(hist, pos[:, None], 1)
    prev = jnp.concatenate([hist[:, :1], hist[:, :-1]], axis=1)  # hist[j-1]
    match = (j >= 1) & (j < pos[:, None]) & (prev == a_tok) & (hist == b_tok)
    # latest match; -1 if none
    idx = jnp.max(jnp.where(match, j, -1), axis=1).astype(jnp.int32)  # [B]
    found = idx >= 0
    base = jnp.where(found, idx + 1, 0)
    gather = jnp.clip(base[:, None] + jnp.arange(G, dtype=jnp.int32)[None, :],
                      0, s - 1)
    drafts = jnp.take_along_axis(hist, gather, axis=1)
    return jnp.where(found[:, None], drafts, 0)


def spec_block(
    cfg: M.LlamaConfig,
    params: Dict,
    tok: Array,        # [B] current token (already emitted)
    pos: Array,        # [B] its position
    cache,             # stacked KVCache
    hist: Array,       # [B, S_hist] token history (see ngram_draft)
    active: Array,     # [B] bool
    n_steps: int,
    G: int,
) -> Tuple[Array, Array, Array, Array, Array, Array, object]:
    """Run `n_steps` speculative verify steps in one scan.

    Returns (emit_hist [K, B, G+1], emit_lp [K, B, G+1] — raw-model
    log-probs of the emitted tokens — n_emit [K, B], tok, pos, hist,
    cache): step k emitted emit_hist[k, b, :n_emit[k, b]] tokens."""
    b = tok.shape[0]
    rows = jnp.arange(b)
    garange = jnp.arange(G + 1, dtype=jnp.int32)

    def step(carry, _):
        tok, pos, cache, hist = carry
        drafts = ngram_draft(hist, pos, G)               # [B, G]
        tokens_in = jnp.concatenate([tok[:, None], drafts], axis=1)
        positions = pos[:, None] + garange[None, :]
        logits, cache = _verify_forward(cfg, params, tokens_in,
                                        positions, cache)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, G+1]
        lf = logits.astype(jnp.float32)
        lp = (jnp.take_along_axis(lf, greedy[..., None], -1)[..., 0]
              - jax.nn.logsumexp(lf, axis=-1))                  # [B, G+1]
        ok = (drafts == greedy[:, :-1])
        n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1,
                        dtype=jnp.int32)
        # emitted tokens are exactly the greedy prefix [: n_acc+1]
        n_emit = jnp.where(active, n_acc + 1, 0)
        next_tok = greedy[rows, n_acc]
        new_pos = pos + n_emit
        # history: write the verified inputs and the correction token
        # (rejected tail entries are beyond new_pos -> ignored/overwritten)
        hist = hist.at[rows[:, None], positions].set(
            jnp.where(active[:, None], tokens_in,
                      jnp.take_along_axis(hist, positions, 1)))
        upd_pos = jnp.where(active, new_pos, pos)
        hist = hist.at[rows, upd_pos].set(
            jnp.where(active, next_tok,
                      jnp.take_along_axis(hist, pos[:, None], 1)[:, 0]))
        tok = jnp.where(active, next_tok, tok)
        pos = jnp.where(active, new_pos, pos)
        return (tok, pos, cache, hist), (greedy, lp, n_emit)

    (tok, pos, cache, hist), (emit_hist, emit_lp, n_emit) = jax.lax.scan(
        step, (tok, pos, cache, hist), None, length=n_steps)
    return emit_hist, emit_lp, n_emit, tok, pos, hist, cache


def _draft_step_fn(dcfg):
    from piquant_tpu.models import mla as _mla
    if isinstance(dcfg, _mla.MLAConfig):
        return _mla.decode_step
    return M.decode_step


def draft_spec_block(
    cfg: M.LlamaConfig,
    params: Dict,
    dcfg,
    dparams: Dict,
    tok: Array,        # [B] current token (already emitted)
    pos: Array,        # [B] its position
    cache,             # target stacked KVCache
    dcache,            # DRAFT stacked KVCache (same max_len/batch)
    active: Array,     # [B] bool
    n_steps: int,
    G: int,
):
    """Draft-MODEL speculative decoding: G greedy steps of a small draft
    model propose the continuation; the target verifies all G in one
    T=G+1 forward (classic two-model speculation, greedy-exact).

    The draft cache stays consistent by the same masking invariant as the
    target's: drafting writes draft-KV for `tok` and its G-1 proposals at
    positions [pos, pos+G); after the target accepts n and emits its
    correction token, the next round's draft step feeds that correction
    at position pos+n+1, overwriting the first rejected slot before
    anything ever attends to it.  Acceptance (and therefore speedup) is a
    property of draft/target agreement — with a GOOD draft (e.g. the
    same model quantized harder) most steps emit G+1 tokens per target
    forward.

    Returns (emit_hist [K,B,G+1], emit_lp, n_emit [K,B], tok, pos,
    cache, dcache)."""
    b = tok.shape[0]
    rows = jnp.arange(b)
    garange = jnp.arange(G + 1, dtype=jnp.int32)
    dstep_fn = _draft_step_fn(dcfg)

    def step(carry, _):
        tok, pos, cache, dcache = carry

        def dstep(dc_carry, _):
            t, p, dc = dc_carry
            dlogits, dc = dstep_fn(dcfg, dparams, t, p, dc)
            t2 = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)
            return (t2, p + 1, dc), t2

        (_, _, dcache), drafts_t = jax.lax.scan(
            dstep, (tok, pos, dcache), None, length=G)
        drafts = drafts_t.T                              # [B, G]
        tokens_in = jnp.concatenate([tok[:, None], drafts], axis=1)
        positions = pos[:, None] + garange[None, :]
        logits, cache = _verify_forward(cfg, params, tokens_in,
                                        positions, cache)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lf = logits.astype(jnp.float32)
        lp = (jnp.take_along_axis(lf, greedy[..., None], -1)[..., 0]
              - jax.nn.logsumexp(lf, axis=-1))
        ok = (drafts == greedy[:, :-1])
        n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1,
                        dtype=jnp.int32)
        n_emit = jnp.where(active, n_acc + 1, 0)
        next_tok = greedy[rows, n_acc]
        tok = jnp.where(active, next_tok, tok)
        pos = jnp.where(active, pos + n_emit, pos)
        return (tok, pos, cache, dcache), (greedy, lp, n_emit)

    (tok, pos, cache, dcache), (emit_hist, emit_lp, n_emit) = jax.lax.scan(
        step, (tok, pos, cache, dcache), None, length=n_steps)
    return emit_hist, emit_lp, n_emit, tok, pos, cache, dcache


def rejection_sample_step(p: Array, q: Array, drafts: Array, key: Array):
    """One round of speculative REJECTION sampling (Leviathan et al. 2023 /
    Chen et al. 2023), vectorized over the batch.

    p [B, G+1, V]: target probabilities at the G+1 verified positions;
    q [B, G, V]: draft probabilities the G `drafts` [B, G] were drawn
    from.  Draft i is accepted with prob min(1, p_i(d_i)/q_i(d_i)); at
    the first rejection the correction token is drawn from the residual
    norm(max(p_i - q_i, 0)); if all G are accepted, a bonus token is
    drawn from p_G.  THEOREM: every emitted token is distributed exactly
    as the target would sample it — speedup without distribution drift
    (unit-tested by Monte-Carlo against the analytic marginal).

    Returns (n_acc [B], next_tok [B]): n_acc accepted drafts, then
    next_tok (the correction or bonus) — emitted tokens are
    [drafts[:n_acc], next_tok], exactly like the greedy path's contract."""
    b, g, v = q.shape
    rows = jnp.arange(b)
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (b, g), jnp.float32)
    p_d = jnp.take_along_axis(p[:, :g], drafts[..., None], -1)[..., 0]
    q_d = jnp.take_along_axis(q, drafts[..., None], -1)[..., 0]
    acc = u * jnp.maximum(q_d, 1e-20) < p_d                    # [B, G]
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1,
                    dtype=jnp.int32)                           # [B]
    # correction distribution at the first rejected position; bonus = p_G
    p_j = p[rows, n_acc]                                       # [B, V]
    q_j = jnp.where((n_acc < g)[:, None],
                    q[rows, jnp.minimum(n_acc, g - 1)], 0.0)
    resid = jnp.maximum(p_j - q_j, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    # degenerate residual (p <= q everywhere up to fp error): fall back
    # to the target distribution — still exact in the limit rs -> 0
    dist = jnp.where(rs > 1e-12, resid / jnp.maximum(rs, 1e-20), p_j)
    next_tok = jax.random.categorical(
        kr, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1).astype(jnp.int32)
    return n_acc, next_tok


def draft_spec_block_sample(
    cfg: M.LlamaConfig,
    params: Dict,
    dcfg,
    dparams: Dict,
    tok: Array,        # [B]
    pos: Array,        # [B]
    cache,
    dcache,
    temps: Array,      # [B] f32 > 0 (pure temperature sampling)
    base_key: Array,
    blk_idx,
    active: Array,
    n_steps: int,
    G: int,
):
    """Stochastic two-model speculation: drafts are SAMPLED from the
    draft model at each row's temperature and accepted by rejection
    sampling, so the emitted stream is distributed exactly as plain
    temperature sampling from the target (pure-temperature rows only —
    top-k/top-p truncation would need matching truncation on both
    distributions).  Same return contract as draft_spec_block."""
    b = tok.shape[0]
    rows = jnp.arange(b)
    garange = jnp.arange(G + 1, dtype=jnp.int32)
    dstep_fn = _draft_step_fn(dcfg)
    t_inv = 1.0 / jnp.maximum(temps, 1e-6)

    def step(carry, k):
        tok, pos, cache, dcache = carry
        kd, kv = jax.random.split(k)
        dkeys = jax.random.split(kd, G)

        def dstep(dc_carry, dk):
            t, p, dc = dc_carry
            dlogits, dc = dstep_fn(dcfg, dparams, t, p, dc)
            dl = dlogits.astype(jnp.float32) * t_inv[:, None]
            t2 = jax.random.categorical(dk, dl, axis=-1).astype(jnp.int32)
            return (t2, p + 1, dc), (t2, jax.nn.softmax(dl, axis=-1))

        (_, _, dcache), (drafts_t, qdist_t) = jax.lax.scan(
            dstep, (tok, pos, dcache), dkeys)
        drafts = drafts_t.T                          # [B, G]
        q = jnp.moveaxis(qdist_t, 0, 1)              # [B, G, V]
        tokens_in = jnp.concatenate([tok[:, None], drafts], axis=1)
        positions = pos[:, None] + garange[None, :]
        logits, cache = _verify_forward(cfg, params, tokens_in,
                                        positions, cache)
        lf = logits.astype(jnp.float32)
        p = jax.nn.softmax(lf * t_inv[:, None, None], axis=-1)
        n_acc, next_tok = rejection_sample_step(p, q, drafts, kv)
        emitted = jnp.concatenate(
            [drafts, next_tok[:, None]], axis=1)     # provisional [B, G+1]
        # emitted tokens are drafts[:n_acc] then next_tok at slot n_acc
        emitted = jnp.where(garange[None, :] == n_acc[:, None],
                            next_tok[:, None], emitted)
        lp = (jnp.take_along_axis(lf, emitted[..., None], -1)[..., 0]
              - jax.nn.logsumexp(lf, axis=-1))
        n_emit = jnp.where(active, n_acc + 1, 0)
        tok = jnp.where(active, next_tok, tok)
        pos = jnp.where(active, pos + n_emit, pos)
        return (tok, pos, cache, dcache), (emitted, lp, n_emit)

    keys = jax.random.split(jax.random.fold_in(base_key, blk_idx), n_steps)
    (tok, pos, cache, dcache), (emit_hist, emit_lp, n_emit) = jax.lax.scan(
        step, (tok, pos, cache, dcache), keys)
    return emit_hist, emit_lp, n_emit, tok, pos, cache, dcache
