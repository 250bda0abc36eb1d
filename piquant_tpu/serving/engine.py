"""Continuous-batching inference engine.

The serving slice of BASELINE.json ("continuous batching on v5e-16"): a host
scheduler drives two jitted device programs — slot-wise prefill insertion and
a whole-batch decode step — over a fixed pool of batch slots backed by the
stacked INT8 KV cache.  Requests are admitted into free slots as they
arrive/complete (no global barrier between sequences), giving prefill/decode
interleaving and the p50-TTFT behavior the baseline targets.

The reference has no serving layer (it is a kernel library); this engine is
what its primitives were built to feed.  Scheduler state lives on the host
(queue, per-slot metadata, metrics); all tensor state stays on device.

Sharding: pass `mesh` + the model's param/cache PartitionSpecs and the same
engine drives a TP-sharded model — the jitted step functions are
sharding-agnostic (GSPMD inserts the collectives).
"""

from __future__ import annotations

import dataclasses
import time
from collections import OrderedDict, deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.serving.sampler import (TOPK_CAND, SamplingParams,
                                         apply_freq_presence,
                                         apply_repetition_penalty,
                                         sample_batch)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    batch_slots: int = 8
    max_seq_len: int = 2048
    prefill_pad: int = 64      # prompts are right-padded to a multiple of this
                               # to bound the number of compiled prefill shapes
    decode_block: int = 16
    # decode steps per device dispatch: one jitted scan of `decode_block`
    # steps and ONE [K, B] token readback amortize the host/relay round-trip
    # (dominant at small per-step latency).  A request hitting EOS mid-block
    # wastes <= decode_block-1 slot-steps (tokens are trimmed host-side) —
    # the standard multi-step-scheduling trade.
    speculate: int = 0
    # Prompt-lookup speculative decoding: verify `speculate` drafted tokens
    # per model call (device-side n-gram drafting; see models/speculative).
    # Greedy-only: a decode tick speculates only when every active slot has
    # temperature <= 0; mixed/stochastic ticks use normal blocks.  0 = off.
    attn_windows: tuple = ()
    # Optional ladder of attention-window buckets (e.g. (512, 1024, 2048)):
    # decode blocks attend only to the smallest bucket covering the longest
    # active context, cutting cache traffic for short contexts.  Each bucket
    # is a separate compiled executable; with warmup_buckets (default) all
    # buckets are AOT-compiled at Engine construction, so none stalls a
    # serving block mid-run.  Empty = always max_seq_len (one executable).
    warmup_buckets: bool = True
    # Precompile every attn_windows bucket in __init__ (moves the cold-
    # compile cost from the first long-context block to startup).
    track_history: bool = False
    # Maintain a device-side token-history buffer (prompt + generated) for
    # every slot.  Required for SamplingParams.repetition_penalty; also
    # maintained implicitly when speculate > 0 (drafting needs it).
    prefill_chunk: Optional[int] = None
    # When set, prompts are prefilled in fixed-size chunks attending against
    # the (INT8) cache — ONE compiled prefill shape regardless of prompt
    # length, and the scheduler can interleave other work between chunks.
    # Chunks after the first read back quantized K/V (tiny quality cost).
    prefix_cache: int = 0
    # Max pinned KV prefixes (0 = off; requires prefill_chunk).  A prompt
    # starting with a pooled prefix seeds its slot cache from the pool and
    # prefills only the suffix — the vLLM-style system-prompt reuse.  Seed
    # entries with Engine.preseed_prefix(tokens); prefix_cache_auto captures
    # every admitted prompt (LRU).  Each entry holds one max_seq_len slot of
    # quantized KV.  Safe by construction: chunks append their own KV before
    # attending, so any stale pooled positions past the matched length are
    # overwritten before they are ever read.
    prefix_cache_auto: bool = False
    max_guide_states: int = 8192
    # Ceiling on the combined guided-decoding table (rows = total DFA
    # states across distinct TokenGuides; the table is [S, V] bool +
    # [S, V] int32 and grows append-only for the engine's life).  Exceeding
    # it raises at submit() instead of growing device memory without bound
    # — callers serving untrusted grammars should also bound their own
    # guide cache (serving/server.py keeps an LRU).


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    sampling: SamplingParams = SamplingParams()
    guide: Optional[object] = None
    # guided decoding: a serving.guided.TokenGuide compiled for this
    # model's vocab — the decode scan masks logits to the grammar and the
    # request finishes on the guide's EOS (submit() aligns eos_token)
    adapter_id: int = 0
    # multi-tenant LoRA (quant/lora.MultiLoraLinear params): which stacked
    # adapter serves this request; 0 = the null adapter by stack_adapters
    # convention.  Ignored (must stay 0) without multi-LoRA params.
    # filled by the engine:
    tokens: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    # raw-model log p(token | context) for every emitted token (pre-
    # temperature/penalty — the OpenAI-style convention); always populated
    ttft_s: Optional[float] = None
    submitted_at: float = 0.0
    done: bool = False


@dataclasses.dataclass
class EngineMetrics:
    decode_tokens: int = 0
    decode_time_s: float = 0.0
    prefill_tokens: int = 0
    prefill_time_s: float = 0.0
    prefix_hits: int = 0
    prefix_tokens_saved: int = 0
    ttfts: List[float] = dataclasses.field(default_factory=list)

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / self.decode_time_s if self.decode_time_s else 0.0

    def p50_ttft_ms(self) -> float:
        return float(np.median(self.ttfts) * 1e3) if self.ttfts else 0.0

    def p99_ttft_ms(self) -> float:
        return float(np.percentile(self.ttfts, 99) * 1e3) if self.ttfts else 0.0

    def to_dict(self) -> dict:
        """Structured snapshot for logging/observability (SURVEY §5)."""
        return {
            "decode_tokens": self.decode_tokens,
            "decode_tokens_per_s": round(self.decode_tokens_per_s, 2),
            "prefill_tokens": self.prefill_tokens,
            "prefill_tokens_per_s": round(
                self.prefill_tokens / self.prefill_time_s, 2)
            if self.prefill_time_s else 0.0,
            "p50_ttft_ms": round(self.p50_ttft_ms(), 2),
            "p99_ttft_ms": round(self.p99_ttft_ms(), 2),
            "requests": len(self.ttfts),
            "prefix_hits": self.prefix_hits,
            "prefix_tokens_saved": self.prefix_tokens_saved,
        }

    def emit(self, path: str) -> None:
        """Append one JSON line to `path`."""
        import json
        import time as _t

        with open(path, "a") as f:
            f.write(json.dumps({"ts": _t.time(), **self.to_dict()}) + "\n")


# ---------------------------------------------------------------------------
# jitted device programs — MODULE-LEVEL and cached by (cfg, block size) so
# every Engine instance (and repeated constructions in one process) shares
# the same compiled executables; per-instance closures paid a multi-second
# executable load on each new Engine
# ---------------------------------------------------------------------------

import functools


def _tok_logprob(logits, toks):
    """log p(tok) under the RAW model distribution ([B, V] f32 logits)."""
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logits.astype(jnp.float32),
                                 toks[:, None].astype(jnp.int32), 1)[:, 0]
    return chosen - lse


def _model_for(cfg):
    """Model module by config type: the engine is model-agnostic over any
    module exposing init_kv_cache / prefill / decode_step with batch at
    axis 1 on every cache leaf (llama.py KVCache, mla.py LatentKVCache)."""
    from piquant_tpu.models import mla as _mla
    if isinstance(cfg, _mla.MLAConfig):
        return _mla
    return M


@functools.lru_cache(maxsize=None)
def _jit_decode_block(cfg, kblk: int, window: int, rep: bool):
    # NOTE: always call with ALL FOUR positional args — functools.lru_cache
    # keys (a, b, c) and (a, b, c, rep=False) separately, and a key miss
    # returns a fresh jit wrapper whose executable cache is cold (warmup
    # would then not warm anything).
    """One compiled block per (config, block size, attention-window bucket):
    attention reads only the live cache prefix [0, window) instead of
    max_seq_len — decode cache traffic tracks actual context length.
    With rep=True the scan additionally carries the token-history buffer,
    applies the repetition penalty before sampling, and honors min-p.

    Guided decoding rides every variant: the scan carries one int32 DFA
    state per slot (`gstate`), gathers `gmask[gstate]` to -inf the
    grammar-disallowed logits before sampling, and advances
    `gstate = gtrans[gstate, tok]` after (serving/guided.py).  Unguided
    slots point at row 0 of the trivial allow-all table, so the cost is
    two [B]-row gathers per step — noise next to the lm_head matmul.
    Logprobs stay RAW-model (pre-penalty, pre-mask)."""
    mod = _model_for(cfg)

    def _decode_block(params, tok, pos, cache, temps, topks, topps, minps,
                      base_key, blk_idx, active, gmask, gtrans, gstate):
        def step(carry, k):
            t, p, c, gs = carry
            logits, c = mod.decode_step(cfg, params, t, p, c,
                                        attn_window=window)
            raw = logits
            logits = jnp.where(gmask[gs], logits.astype(jnp.float32), -1e30)
            toks = sample_batch(logits, temps, topks, topps, k, minps)
            t2 = jnp.where(active, toks, t)
            gs = jnp.where(active, gtrans[gs, t2], gs)
            return (t2, p + active.astype(jnp.int32), c, gs), (
                t2, _tok_logprob(raw, t2))

        # key derivation stays in-graph: the host passes one int per block
        # (bundled with the dispatch — no eager split round-trip)
        keys = jax.random.split(jax.random.fold_in(base_key, blk_idx), kblk)
        (t, p, cache, gstate), (tok_hist, lp_hist) = jax.lax.scan(
            step, (tok, pos, cache, gstate), keys)
        return tok_hist, lp_hist, t, p, cache, gstate

    def _decode_block_rep(params, tok, pos, cache, hist, temps, topks, topps,
                          minps, pens, freqs, press, plens, bias,
                          eos_ids, min_news,
                          base_key, blk_idx, active, gmask, gtrans, gstate):
        rows = jnp.arange(tok.shape[0])

        def step(carry, k):
            t, p, c, h, gs = carry
            logits, c = mod.decode_step(cfg, params, t, p, c,
                                        attn_window=window)
            # history entries [0, p] are valid (h[b, p] == current token)
            raw = logits
            logits = apply_repetition_penalty(logits, h, p + 1, pens)
            logits = apply_freq_presence(logits, h, plens, p + 1,
                                         freqs, press)
            logits = logits + bias
            # min_new_tokens: suppress the slot's EOS while the count of
            # generated tokens AFTER this step (p + 2 - plen: the first
            # token was emitted at prefill) would still be under the floor
            supp = ((p + 2 - plens) <= min_news) & (eos_ids >= 0)
            logits = logits.astype(jnp.float32).at[
                rows, jnp.maximum(eos_ids, 0)].add(
                jnp.where(supp, -1e30, 0.0))
            logits = jnp.where(gmask[gs], logits.astype(jnp.float32), -1e30)
            toks = sample_batch(logits, temps, topks, topps, k, minps)
            t2 = jnp.where(active, toks, t)
            gs = jnp.where(active, gtrans[gs, t2], gs)
            p2 = p + active.astype(jnp.int32)
            h = h.at[rows, jnp.minimum(p + 1, h.shape[1] - 1)].set(
                jnp.where(active, t2, jnp.take_along_axis(
                    h, jnp.minimum(p + 1, h.shape[1] - 1)[:, None], 1)[:, 0]))
            return (t2, p2, c, h, gs), (t2, _tok_logprob(raw, t2))

        keys = jax.random.split(jax.random.fold_in(base_key, blk_idx), kblk)
        (t, p, cache, hist, gstate), (tok_hist, lp_hist) = jax.lax.scan(
            step, (tok, pos, cache, hist, gstate), keys)
        return tok_hist, lp_hist, t, p, cache, hist, gstate

    if rep:
        return jax.jit(_decode_block_rep, donate_argnums=(3, 4))
    return jax.jit(_decode_block, donate_argnums=(3,))


@functools.lru_cache(maxsize=None)
def _jit_draft_spec_block(cfg, dcfg, kblk: int, g: int):
    from piquant_tpu.models.speculative import draft_spec_block

    def _spec(params, dparams, tok, pos, cache, dcache, active):
        return draft_spec_block(cfg, params, dcfg, dparams, tok, pos,
                                cache, dcache, active, kblk, g)

    return jax.jit(_spec, donate_argnums=(4, 5))


@functools.lru_cache(maxsize=None)
def _jit_draft_spec_sample(cfg, dcfg, kblk: int, g: int):
    from piquant_tpu.models.speculative import draft_spec_block_sample

    def _spec(params, dparams, tok, pos, cache, dcache, temps, base_key,
              blk_idx, active):
        return draft_spec_block_sample(cfg, params, dcfg, dparams, tok, pos,
                                       cache, dcache, temps, base_key,
                                       blk_idx, active, kblk, g)

    return jax.jit(_spec, donate_argnums=(4, 5))


@functools.lru_cache(maxsize=None)
def _jit_draft_prefill(dcfg):
    dmod = _model_for(dcfg)

    def _dprefill(dparams, tokens, slots, fresh, pool):
        _, c1 = dmod.prefill(dcfg, dparams, tokens, fresh)
        return jax.tree.map(lambda big, small: big.at[:, slots].set(small),
                            pool, c1)

    return jax.jit(_dprefill, donate_argnums=(4,))


@functools.lru_cache(maxsize=None)
def _jit_spec_block(cfg: M.LlamaConfig, kblk: int, g: int):
    from piquant_tpu.models.speculative import spec_block

    def _spec(params, tok, pos, cache, hist, active):
        return spec_block(cfg, params, tok, pos, cache, hist, active, kblk, g)

    return jax.jit(_spec, donate_argnums=(3,))


@functools.lru_cache(maxsize=None)
def _jit_hist_append():
    def _hist_append(hist, tok_hist, pos0, active):
        # normal decode block emitted tok_hist[k, b] at position pos0+1+k
        b = jnp.arange(hist.shape[0])
        k = tok_hist.shape[0]
        positions = pos0[:, None] + 1 + jnp.arange(k, dtype=jnp.int32)[None, :]
        cur = jnp.take_along_axis(hist, positions, 1)
        upd = jnp.where(active[:, None], tok_hist.T, cur)
        return hist.at[b[:, None], positions].set(upd)

    return jax.jit(_hist_append)


@functools.lru_cache(maxsize=None)
def _jit_hist_init():
    def _hist_init(hist, slot, row, length):
        mask = jnp.arange(hist.shape[1]) < length
        return hist.at[slot].set(jnp.where(mask, row, hist[slot]))

    return jax.jit(_hist_init)


@functools.lru_cache(maxsize=None)
def _jit_prefill(cfg):
    mod = _model_for(cfg)

    def _prefill(params, tokens, true_len, slots, cache, pool_cache,
                 temp, topk, topp, minp, pen, base_key, idx, gmask_rows,
                 bias_rows):
        # BATCHED admission: `tokens` [Bq, T] carries Bq queued prompts of
        # one pad bucket, prefilled in a single dispatch and inserted into
        # their `slots` [Bq] — burst arrivals pay one device round-trip
        # instead of Bq.  lm_head projects only at each prompt's true last
        # position (the full [Bq, T, V] logits tensor would dominate
        # prefill memory).
        last, cache1 = mod.prefill(cfg, params, tokens, cache,
                                   last_positions=true_len - 1)

        def insert(big, small):
            return big.at[:, slots].set(small)

        new_pool = jax.tree.map(insert, pool_cache, cache1)
        # first sampled tokens honor the repetition penalty over the prompt
        # (the chunked path starts penalizing from the first decode block)
        raw = last
        last = apply_repetition_penalty(last, tokens, true_len, pen)
        last = last + bias_rows
        last = jnp.where(gmask_rows, last.astype(jnp.float32), -1e30)
        tok = sample_batch(last, temp, topk, topp,
                           jax.random.fold_in(base_key, idx), minp)
        return tok, _tok_logprob(raw, tok), new_pool

    return jax.jit(_prefill, donate_argnums=(5,))


@functools.lru_cache(maxsize=None)
def _jit_prefill_chunk(cfg):
    mod = _model_for(cfg)

    def _prefill_chunk(params, tokens, offset, last_pos, cache):
        b, c = tokens.shape
        positions = offset[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
        if mod is M:
            logits, cache = M.forward(cfg, params, tokens, positions=positions,
                                      cache=cache, logit_positions=last_pos,
                                      kv_write_start=offset[0])
            return logits[:, 0], cache
        # MLA: chunked prefill through the absorbed latent path
        return mod.forward_chunk(cfg, params, tokens, positions, cache,
                                 last_positions=last_pos,
                                 kv_write_start=offset[0])

    return jax.jit(_prefill_chunk, donate_argnums=(4,))


@functools.lru_cache(maxsize=None)
def _jit_insert_slot():
    def _insert_slot(pool_cache, cache1, slot):
        def insert(big, small):
            return jax.lax.dynamic_update_slice_in_dim(big, small, slot, axis=1)
        return jax.tree.map(insert, pool_cache, cache1)

    return jax.jit(_insert_slot, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _jit_set_slot_state():
    def _set_slot_state(tok, pos, slot, t, p):
        return tok.at[slot].set(t), pos.at[slot].set(p)

    return jax.jit(_set_slot_state)


@functools.lru_cache(maxsize=None)
def _jit_sample_first():
    def _sample_first(logits, prompt_row, plen, temp, topk, topp, minp, pen,
                      base_key, idx, gmask_row, bias_row):
        raw = logits
        logits = apply_repetition_penalty(logits, prompt_row, plen, pen)
        logits = logits + bias_row
        logits = jnp.where(gmask_row, logits.astype(jnp.float32), -1e30)
        tok = sample_batch(logits, temp, topk, topp,
                           jax.random.fold_in(base_key, idx), minp)
        return tok, _tok_logprob(raw, tok)

    return jax.jit(_sample_first)


class Engine:
    def __init__(self, cfg: M.LlamaConfig, params: Dict, econfig: EngineConfig,
                 *, rng_seed: int = 0, draft=None):
        """`draft` (optional): (draft_cfg, draft_params) — a small model
        whose greedy proposals the target verifies (two-model speculative
        decoding; needs EngineConfig.speculate > 0 for the draft length).
        Greedy-exact like prompt-lookup speculation; acceptance — and the
        tokens/forward payoff — depends on draft/target agreement (e.g.
        the same checkpoint quantized harder).  One-shot admission only."""
        self.cfg = cfg
        self.params = params
        # multi-tenant LoRA (quant/lora.MultiLoraLinear): per-slot adapter
        # indices live on the param tree's leaves; _params_decode carries
        # [batch_slots]-length ids (rebuilt on admission — a pure Python
        # restructure, weight buffers shared), per-admission prefill trees
        # carry a single id
        from piquant_tpu.quant import lora as _lora

        self._lora = _lora
        self._n_adapters = _lora.n_adapters(params)
        self._adapters = np.zeros((econfig.batch_slots,), np.int32)
        self._adapters_dirty = False
        self._params_decode = (params if self._n_adapters is None
                               else _lora.set_adapter_ids(
                                   params, self._adapters))
        if econfig.prefill_pad > econfig.max_seq_len:
            # prompts are padded to a prefill_pad multiple; a pad larger
            # than the cache cannot fit any prompt
            econfig = dataclasses.replace(
                econfig, prefill_pad=econfig.max_seq_len)
        self.ec = econfig
        self.metrics = EngineMetrics()
        self._queue: deque[Request] = deque()
        self._all: List[Request] = []
        self._slots: List[Optional[Request]] = [None] * econfig.batch_slots
        self._key = jax.random.key(rng_seed)
        self._blk_counter = 0  # in-graph key derivation index
        self._pending_prefill: Optional[dict] = None  # incremental chunked
                                                      # admission state

        b = econfig.batch_slots
        self._model = _model_for(cfg)
        if econfig.prefill_chunk and econfig.prefill_chunk > econfig.max_seq_len:
            raise ValueError(
                f"prefill_chunk={econfig.prefill_chunk} exceeds "
                f"max_seq_len={econfig.max_seq_len}")
        if econfig.prefix_cache and not econfig.prefill_chunk:
            raise ValueError("prefix_cache requires prefill_chunk (the "
                             "suffix resumes through the chunked path)")
        # token-tuple -> (1-slot cache pytree, effective prefix length);
        # insertion order doubles as LRU order
        self._prefix_pool: "OrderedDict[tuple, tuple]" = OrderedDict()
        self.cache = self._model.init_kv_cache(cfg, b,
                                               max_len=econfig.max_seq_len)
        self._cur_tok = jnp.zeros((b,), jnp.int32)
        self._positions = jnp.zeros((b,), jnp.int32)
        self._active = np.zeros((b,), bool)  # host-side mask
        self._host_pos = np.zeros((b,), np.int64)  # host mirror for
                                                   # attention-window buckets

        # per-slot sampling params mirrored as arrays so ONE fused
        # decode+sample dispatch serves any per-request mix (and only the
        # [B] token vector crosses the host boundary each step)
        self._temps = np.zeros((b,), np.float32)
        self._topks = np.zeros((b,), np.int32)
        self._topps = np.ones((b,), np.float32)
        self._minps = np.zeros((b,), np.float32)
        self._pens = np.ones((b,), np.float32)
        self._freqs = np.zeros((b,), np.float32)   # OpenAI freq penalty
        self._press = np.zeros((b,), np.float32)   # OpenAI presence penalty
        self._plens = np.zeros((b,), np.int32)     # prompt lens (gen-only
                                                   # penalty window)
        self._eos_ids = np.full((b,), -1, np.int32)
        self._minnews = np.zeros((b,), np.int32)   # min_new_tokens floors
        # the [B, V] logit-bias buffer has its OWN dirty flag: staging it
        # with the tiny per-slot vectors would re-upload vocab_size*B*4
        # bytes on every admission even when no request uses logit_bias
        self._bias_np = np.zeros((b, cfg.vocab_size), np.float32)
        self._bias_dev = jnp.zeros((b, cfg.vocab_size), jnp.float32)
        self._bias_dirty = False
        self._slot_state_dirty = True  # device mirrors staged lazily

        # guided decoding: all slots' guides share ONE combined table —
        # each guide's states occupy a contiguous row block (offset via
        # _ensure_guide), row 0 is the trivial allow-all guide for
        # unguided slots.  Growing the table (first admission of a new
        # guide) changes the decode block's arg shape => one recompile.
        v = cfg.vocab_size
        self._gmask_np = np.ones((1, v), bool)
        self._gtrans_np = np.zeros((1, v), np.int32)
        self._guide_offsets: Dict[int, int] = {}   # id(guide) -> row offset
        self._gstate = jnp.zeros((b,), jnp.int32)  # device-resident carry
        self._slot_guided = np.zeros((b,), bool)
        self._guides_dirty = True                  # device tables staged lazily

        # --- jitted device programs (shared, module-level caches) --------
        self._prefill = _jit_prefill(cfg)
        self._prefill_chunk = _jit_prefill_chunk(cfg)
        self._insert_slot = _jit_insert_slot()
        self._set_slot_state = _jit_set_slot_state()
        self._sample_first = _jit_sample_first()
        if econfig.speculate > 0 or econfig.track_history:
            self._hist = jnp.zeros((b, econfig.max_seq_len + econfig.speculate + 2),
                                   jnp.int32)
        self._draft = draft
        if draft is not None:
            dcfg, _ = draft
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError(f"draft vocab {dcfg.vocab_size} != target "
                                 f"vocab {cfg.vocab_size}")
            if econfig.speculate <= 0:
                raise ValueError("a draft model needs EngineConfig."
                                 "speculate > 0 (the proposal length)")
            if econfig.prefill_chunk or econfig.prefix_cache:
                raise ValueError("draft-model speculation supports one-shot "
                                 "admission only (no prefill_chunk / "
                                 "prefix_cache)")
            self._dmodel = _model_for(dcfg)
            self._dcache = self._dmodel.init_kv_cache(
                dcfg, b, max_len=econfig.max_seq_len)
            self._dfresh: Dict[int, object] = {}

        # reusable zeroed admission caches keyed by batch width (immutable;
        # never donated); lazy: only the one-shot prefill path uses them,
        # and the chunked path would otherwise strand ~100+ MB of HBM
        self._fresh_template_cache: Dict[int, object] = {}

        if econfig.attn_windows and econfig.warmup_buckets:
            self._warmup_decode_buckets()

    # ------------------------------------------------------------------
    def _warmup_decode_buckets(self) -> None:
        """Warm every attention-window bucket at construction so a cold
        bucket never stalls a serving block mid-run (the p99 hit that made
        buckets opt-in).  Must EXECUTE once per bucket, not just
        lower().compile(): a Compiled object does not populate jit's
        in-memory executable cache, so the serving call would still pay a
        multi-second persistent-cache load at first dispatch (measured:
        bucketed decode ran at 269 vs 653 tok/s with compile-only warmup).
        Each warmup call runs one decode block on a throwaway cache (the
        jit donates its cache argument)."""
        b = self.ec.batch_slots
        for w in sorted(set(tuple(self.ec.attn_windows)
                            + (self.ec.max_seq_len,))):
            rep = bool(self.ec.track_history)
            fn = _jit_decode_block(self.cfg, self.ec.decode_block, w, rep)
            scratch_cache = self._model.init_kv_cache(self.cfg, b,
                                            max_len=self.ec.max_seq_len)
            hist_args = (self._hist,) if rep else ()
            minpen = ((jnp.zeros((b,), jnp.float32),
                       jnp.ones((b,), jnp.float32),
                       jnp.zeros((b,), jnp.float32),
                       jnp.zeros((b,), jnp.float32),
                       jnp.zeros((b,), jnp.int32),
                       jnp.zeros((b, self.cfg.vocab_size), jnp.float32),
                       jnp.full((b,), -1, jnp.int32),
                       jnp.zeros((b,), jnp.int32))
                      if rep else (jnp.zeros((b,), jnp.float32),))
            out = fn(self._params_decode, self._cur_tok, self._positions,
                     scratch_cache, *hist_args, jnp.zeros((b,), jnp.float32),
                     jnp.zeros((b,), jnp.int32), jnp.ones((b,), jnp.float32),
                     *minpen, self._key, 0, jnp.zeros((b,), jnp.bool_),
                     jnp.asarray(self._gmask_np), jnp.asarray(self._gtrans_np),
                     self._gstate)
            jax.block_until_ready(out[0])
            if rep:
                self._hist = out[5]  # donated in; keep the live buffer
            del scratch_cache, out

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> None:
        if not req.prompt:
            raise ValueError(f"request {req.rid}: prompt must be non-empty")
        if req.sampling.top_k > TOPK_CAND:
            raise ValueError(
                f"request {req.rid}: top_k={req.sampling.top_k} exceeds the "
                f"sampler candidate window ({TOPK_CAND}); sampling would "
                f"silently use a narrower candidate set (sampler.TOPK_CAND)")
        if not self.ec.track_history and (
                req.sampling.repetition_penalty != 1.0
                or req.sampling.frequency_penalty != 0.0
                or req.sampling.presence_penalty != 0.0
                or req.sampling.min_new_tokens > 0
                or req.sampling.logit_bias):
            raise ValueError(
                f"request {req.rid}: repetition/frequency/presence penalties, "
                "min_new_tokens, and logit_bias need the device-side token "
                "history — set EngineConfig.track_history=True")
        if req.sampling.min_new_tokens > 0 and req.guide is not None:
            raise ValueError(
                f"request {req.rid}: min_new_tokens cannot combine with a "
                "guide (the grammar decides when EOS is legal)")
        for t, _ in req.sampling.logit_bias:
            if not 0 <= t < self.cfg.vocab_size:
                raise ValueError(f"request {req.rid}: logit_bias token {t} "
                                 f"outside vocab {self.cfg.vocab_size}")
        if req.adapter_id:
            if self._n_adapters is None:
                raise ValueError(
                    f"request {req.rid}: adapter_id={req.adapter_id} but the "
                    "params carry no MultiLoraLinear (quant/lora."
                    "stack_adapters)")
            if not 0 <= req.adapter_id < self._n_adapters:
                raise ValueError(
                    f"request {req.rid}: adapter_id={req.adapter_id} outside "
                    f"[0, {self._n_adapters})")
        if req.guide is not None:
            if req.guide.vocab_size != self.cfg.vocab_size:
                raise ValueError(
                    f"request {req.rid}: guide vocab {req.guide.vocab_size} "
                    f"!= model vocab {self.cfg.vocab_size}")
            # the guide's EOS is what terminates a complete match — align
            # the stop condition (a fresh SamplingParams: the default
            # instance is shared across Requests)
            if req.sampling.eos_token != req.guide.eos_id:
                req.sampling = dataclasses.replace(
                    req.sampling, eos_token=req.guide.eos_id)
            self._ensure_guide(req.guide)
        req.submitted_at = time.perf_counter()
        self._queue.append(req)
        self._all.append(req)

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self._slots):
            if r is None:
                return i
        return None

    # ------------------------------------------------------------------
    # guided decoding (serving/guided.py)
    # ------------------------------------------------------------------
    def _ensure_guide(self, guide) -> int:
        """Register a TokenGuide in the combined table; returns its row
        offset.  Append-only: offsets stay valid for the engine's life."""
        off = self._guide_offsets.get(id(guide))
        if off is not None:
            return off
        guide.check_complete()  # reject hand-built tables with stuck states
        off = self._gmask_np.shape[0]
        if off + guide.mask.shape[0] > self.ec.max_guide_states:
            raise ValueError(
                f"combined guide table would reach "
                f"{off + guide.mask.shape[0]} states > "
                f"EngineConfig.max_guide_states={self.ec.max_guide_states} "
                "(the table grows append-only per distinct TokenGuide — "
                "reuse guide objects / bound your guide cache)")
        self._gmask_np = np.concatenate([self._gmask_np, guide.mask])
        self._gtrans_np = np.concatenate(
            [self._gtrans_np, guide.trans.astype(np.int32) + off])
        self._guide_offsets[id(guide)] = off
        self._guides_dirty = True
        return off

    def _first_mask_row(self, req: Request):
        """[1, V] bool logits mask for a request's FIRST sampled token
        (guide start state; all-true when unguided)."""
        if req.guide is None:
            return jnp.ones((1, self.cfg.vocab_size), bool)
        return jnp.asarray(req.guide.mask[0][None])

    def _prefill_params(self, req: Request):
        """Param tree for this request's prefill: the shared tree, or the
        multi-LoRA tree with a single-row adapter id."""
        if self._n_adapters is None:
            return self.params
        return self._lora.set_adapter_ids(self.params, [req.adapter_id])

    def _first_bias_row(self, req: Request):
        row = np.zeros((1, self.cfg.vocab_size), np.float32)
        for t, bv in req.sampling.logit_bias:
            row[0, t] = bv
        # min_new_tokens >= 1 also suppresses EOS as the FIRST token
        if req.sampling.min_new_tokens > 0 and req.sampling.eos_token >= 0:
            row[0, req.sampling.eos_token] = -1e30
        return jnp.asarray(row)

    # ------------------------------------------------------------------
    # prefix caching (vLLM-style system-prompt KV reuse)
    # ------------------------------------------------------------------
    def preseed_prefix(self, tokens: List[int], adapter_id: int = 0) -> int:
        """Prefill `tokens` once and pin their KV in the prefix pool; every
        later prompt starting with them skips that prefill work.  Only
        complete prefill_chunk multiples are cached (a partial tail chunk
        would write pad-token KV the suffix does not overwrite before
        reading).  Pool entries are keyed by (adapter_id, tokens): prefix
        KV computed under one LoRA adapter is never reused for another.
        Returns the cached effective length."""
        if not self.ec.prefix_cache:
            raise ValueError("prefix_cache is 0: enable it in EngineConfig")
        c = self.ec.prefill_chunk
        # complete chunks only, and leave >= one chunk of room for a suffix
        eff = min(len(tokens) // c, (self.ec.max_seq_len - c) // c) * c
        if eff <= 0:
            return 0
        fresh = self._model.init_kv_cache(self.cfg, 1,
                                          max_len=self.ec.max_seq_len)
        pp = (self.params if self._n_adapters is None
              else self._lora.set_adapter_ids(self.params, [adapter_id]))
        for s in range(0, eff, c):
            chunk = list(tokens[s:s + c])
            _, fresh = self._prefill_chunk(
                pp, jnp.asarray([chunk], jnp.int32),
                jnp.asarray([s], jnp.int32),
                jnp.asarray([0], jnp.int32), fresh)
        self._pool_put((adapter_id, tuple(tokens[:eff])), fresh, eff)
        return eff

    def _pool_put(self, key: tuple, cache, eff: int) -> None:
        pool = self._prefix_pool
        if key in pool:
            pool.move_to_end(key)
            return
        while len(pool) >= self.ec.prefix_cache:
            pool.popitem(last=False)           # evict least-recently-used
        pool[key] = (cache, eff)

    def _match_prefix(self, prompt: List[int], adapter_id: int = 0):
        """Longest pooled prefix of `prompt` under the same adapter ->
        (key, cache, eff) or None."""
        best = None
        for key, (cache, eff) in self._prefix_pool.items():
            aid, toks = key
            if (aid == adapter_id and len(toks) <= len(prompt)
                    and (best is None or eff > best[2])
                    and list(toks) == prompt[:len(toks)]):
                best = (key, cache, eff)
        if best is not None:
            self._prefix_pool.move_to_end(best[0])
        return best

    def _admit(self, max_chunks: Optional[int] = None) -> None:
        """Admit queued requests into free slots.

        With `prefill_chunk` set, admission is INCREMENTAL: at most
        `max_chunks` prefill chunks are processed per call, so the decode
        loop never stalls more than one chunk per scheduler tick while a
        long prompt streams in (prefill/decode interleaving).  Without
        chunking (or max_chunks=None) admission completes inline."""
        budget = max_chunks
        while True:
            if self._pending_prefill is None:
                if not self._queue:
                    return
                slot = self._free_slot()
                if slot is None:
                    return
                req = self._queue.popleft()
                t0 = time.perf_counter()
                plen = len(req.prompt)
                if plen + req.sampling.max_new_tokens > self.ec.max_seq_len:
                    raise ValueError(
                        f"request {req.rid}: prompt {plen} + max_new "
                        f"{req.sampling.max_new_tokens} exceeds max_seq_len "
                        f"{self.ec.max_seq_len}")
                if not self.ec.prefill_chunk:
                    # batched admission: pull further queued requests of
                    # the SAME pad bucket into the same prefill dispatch
                    # while free slots last (burst arrivals pay one device
                    # round-trip, not one each)
                    batch = [(req, slot, plen, t0)]
                    pad0 = self._padded_len(plen)
                    while self._queue:
                        nxt = self._queue[0]
                        nplen = len(nxt.prompt)
                        if (nplen + nxt.sampling.max_new_tokens
                                > self.ec.max_seq_len):
                            break  # handled (raised) on its own admission
                        if self._padded_len(nplen) != pad0:
                            break
                        s2 = self._free_slot_excluding(
                            [b[1] for b in batch])
                        if s2 is None:
                            break
                        self._queue.popleft()
                        batch.append((nxt, s2, nplen, time.perf_counter()))
                    # truncate the burst to a power of two: the prefill
                    # executable is keyed by (pad bucket, burst size), so
                    # free-running burst sizes mean up to `slots` compiles
                    # per bucket — each a multi-second stall when it lands
                    # mid-serving.  {1,2,4,8,...} bounds the executable
                    # space; the remainder re-queues and admits on the
                    # immediately following tick as its own burst.
                    keep = 1 << (len(batch).bit_length() - 1)
                    for extra in reversed(batch[keep:]):
                        self._queue.appendleft(extra[0])
                    self._admit_one_shot(batch[:keep])
                    continue
                c = self.ec.prefill_chunk
                # Fixed-size chunk starts covering [0, plen).  The final
                # start is shifted BACK so its window never writes past
                # max_seq_len (padding a 97-token prompt to a 128-multiple
                # in a 100-slot cache used to make the cache append's
                # dynamic_update_slice clamp the start index, silently
                # shifting the real KV entries).  The shifted window
                # re-processes a few already-prefilled tokens: forward is
                # deterministic and positions are absolute, so it rewrites
                # identical KV values — correctness is unchanged.
                # prefix-cache hit: seed the slot cache from the pool and
                # prefill only the suffix.  The pool entry is COPIED — the
                # chunk chain donates its cache buffers.
                m0 = 0
                fresh = None
                if self.ec.prefix_cache:
                    hit = self._match_prefix(req.prompt, req.adapter_id)
                    if hit is not None:
                        _, pcache, eff = hit
                        m0 = min(eff, plen - 1)
                        fresh = jax.tree.map(lambda a: a.copy(), pcache)
                        self.metrics.prefix_hits += 1
                        self.metrics.prefix_tokens_saved += m0
                if fresh is None:
                    # per-admission buffer (the shared template would be
                    # consumed by the first donating chunk)
                    fresh = self._model.init_kv_cache(
                        self.cfg, 1, max_len=self.ec.max_seq_len)
                starts = list(range(m0, plen, c))
                if starts[-1] + c > self.ec.max_seq_len:
                    starts[-1] = self.ec.max_seq_len - c
                self._pending_prefill = {
                    "req": req, "slot": slot, "plen": plen, "t0": t0,
                    "starts": starts, "j": 0, "last": None,
                    "fresh": fresh,
                }

            p = self._pending_prefill
            c = self.ec.prefill_chunk
            while p["j"] < len(p["starts"]):
                if budget is not None and budget <= 0:
                    return
                s = p["starts"][p["j"]]
                is_final = p["j"] == len(p["starts"]) - 1
                chunk = p["req"].prompt[s:s + c]
                chunk = chunk + [0] * (c - len(chunk))
                lp = jnp.asarray([p["plen"] - 1 - s if is_final else 0],
                                 jnp.int32)
                p["last"], p["fresh"] = self._prefill_chunk(
                    self._prefill_params(p["req"]),
                    jnp.asarray([chunk], jnp.int32),
                    jnp.asarray([s], jnp.int32), lp, p["fresh"])
                p["j"] += 1
                if budget is not None:
                    budget -= 1
            # all chunks done: install the slot cache + first token
            if self.ec.prefix_cache and self.ec.prefix_cache_auto:
                # capture this prompt's complete-chunk prefix for reuse;
                # p["fresh"] is not donated past this point, so no copy —
                # seeding copies OUT of the pool instead
                ceff = min(p["plen"] // c,
                           (self.ec.max_seq_len - c) // c) * c
                if ceff > 0:
                    self._pool_put(
                        (p["req"].adapter_id,
                         tuple(p["req"].prompt[:ceff])),
                        p["fresh"], ceff)
            self.cache = self._insert_slot(self.cache, p["fresh"], p["slot"])
            tok, lp = self._sample(p["last"], p["req"])
            self._record_first_token(p["req"], tok, p["slot"], p["plen"],
                                     p["t0"], lp=lp)
            self._pending_prefill = None

    def _padded_len(self, plen: int) -> int:
        pad = min(-plen % self.ec.prefill_pad or 0,
                  self.ec.max_seq_len - plen)
        return plen + pad

    def _free_slot_excluding(self, taken) -> Optional[int]:
        for i, r in enumerate(self._slots):
            if r is None and i not in taken:
                return i
        return None

    def _admit_one_shot(self, batch) -> None:
        """One prefill dispatch for `batch` = [(req, slot, plen, t0), ...]
        (all of one pad bucket)."""
        bq = len(batch)
        width = self._padded_len(batch[0][2])
        fresh = self._fresh_template_cache.get(bq)
        if fresh is None:
            fresh = self._model.init_kv_cache(self.cfg, bq,
                                              max_len=self.ec.max_seq_len)
            self._fresh_template_cache[bq] = fresh  # never donated
        rows = np.zeros((bq, width), np.int32)
        for i, (req, _, plen, _) in enumerate(batch):
            rows[i, :plen] = np.asarray(req.prompt, np.int32)
        sps = [req.sampling for req, _, _, _ in batch]
        if self._n_adapters is None:
            pp = self.params
        else:
            pp = self._lora.set_adapter_ids(
                self.params, [req.adapter_id for req, _, _, _ in batch])
        self._blk_counter += 1
        tok_dev, lp_dev, self.cache = self._prefill(
            pp, jnp.asarray(rows),
            jnp.asarray([plen for _, _, plen, _ in batch], jnp.int32),
            jnp.asarray([slot for _, slot, _, _ in batch], jnp.int32),
            fresh, self.cache,
            np.asarray([sp.temperature for sp in sps], np.float32),
            np.asarray([sp.top_k for sp in sps], np.int32),
            np.asarray([sp.top_p for sp in sps], np.float32),
            np.asarray([sp.min_p for sp in sps], np.float32),
            np.asarray([sp.repetition_penalty for sp in sps], np.float32),
            self._key, self._blk_counter,
            jnp.concatenate([self._first_mask_row(req)
                             for req, _, _, _ in batch]),
            jnp.concatenate([self._first_bias_row(req)
                             for req, _, _, _ in batch]))
        # padded positions wrote scales too, but attention masks beyond
        # `position` ignore them
        if self._draft is not None:
            # the draft model needs the prompt's KV too (same slots)
            dcfg, dparams = self._draft
            dfresh = self._dfresh.get(bq)
            if dfresh is None:
                dfresh = self._dmodel.init_kv_cache(
                    dcfg, bq, max_len=self.ec.max_seq_len)
                self._dfresh[bq] = dfresh  # never donated
            self._dcache = _jit_draft_prefill(dcfg)(
                dparams, jnp.asarray(rows),
                jnp.asarray([slot for _, slot, _, _ in batch], jnp.int32),
                dfresh, self._dcache)
        toks = np.asarray(tok_dev)
        lps = np.asarray(lp_dev)
        for i, (req, slot, plen, t0) in enumerate(batch):
            self._record_first_token(req, int(toks[i]), slot, plen, t0,
                                     lp=float(lps[i]))

    def _sample(self, logits: Array, req: Request):
        self._blk_counter += 1
        sp = req.sampling
        # fixed-shape prompt row so the chunked path's first token honors
        # the repetition penalty without a per-length recompile
        row = np.zeros((1, self.ec.max_seq_len), np.int32)
        row[0, : len(req.prompt)] = np.asarray(req.prompt, np.int32)
        t, lp = self._sample_first(logits, jnp.asarray(row),
                                   np.asarray([len(req.prompt)], np.int32),
                                   np.asarray([sp.temperature], np.float32),
                                   np.asarray([sp.top_k], np.int32),
                                   np.asarray([sp.top_p], np.float32),
                                   np.asarray([sp.min_p], np.float32),
                                   np.asarray([sp.repetition_penalty],
                                              np.float32),
                                   self._key, self._blk_counter,
                                   self._first_mask_row(req),
                                   self._first_bias_row(req))
        return int(t[0]), float(lp[0])

    def _record_first_token(self, req: Request, tok: int, slot: int,
                            plen: int, t0: float,
                            lp: Optional[float] = None) -> None:
        now = time.perf_counter()
        req.ttft_s = now - req.submitted_at
        self.metrics.ttfts.append(req.ttft_s)
        self.metrics.prefill_tokens += plen
        self.metrics.prefill_time_s += now - t0
        req.tokens.append(tok)
        if lp is not None:
            req.logprobs.append(lp)
        self._slots[slot] = req
        self._active[slot] = True
        self._temps[slot] = req.sampling.temperature
        self._topks[slot] = req.sampling.top_k
        self._topps[slot] = req.sampling.top_p
        self._minps[slot] = req.sampling.min_p
        self._pens[slot] = req.sampling.repetition_penalty
        self._freqs[slot] = req.sampling.frequency_penalty
        self._press[slot] = req.sampling.presence_penalty
        self._plens[slot] = plen
        self._eos_ids[slot] = req.sampling.eos_token
        self._minnews[slot] = req.sampling.min_new_tokens
        if req.sampling.logit_bias or self._bias_np[slot].any():
            self._bias_np[slot] = 0.0
            for t, bv in req.sampling.logit_bias:
                self._bias_np[slot, t] = bv
            self._bias_dirty = True
        self._slot_state_dirty = True
        self._host_pos[slot] = plen
        # guided: absolute DFA row after the first token (start-state
        # transition is host-side math — the token was read back anyway)
        if req.guide is not None:
            off = self._ensure_guide(req.guide)
            gs = off + int(req.guide.trans[0, tok])
        else:
            gs = 0
        self._gstate = self._gstate.at[slot].set(gs)
        self._slot_guided[slot] = req.guide is not None
        if self._n_adapters is not None and (
                self._adapters[slot] != req.adapter_id):
            self._adapters[slot] = req.adapter_id
            self._adapters_dirty = True
        self._cur_tok, self._positions = self._set_slot_state(
            self._cur_tok, self._positions, slot, tok, plen)
        if self.ec.speculate > 0 or self.ec.track_history:
            row = np.zeros((self._hist.shape[1],), np.int32)
            row[: plen] = np.asarray(req.prompt, np.int32)
            row[plen] = tok
            self._hist = _jit_hist_init()(self._hist, slot, jnp.asarray(row),
                                          plen + 1)
        self._maybe_finish(req, slot)

    def _maybe_finish(self, req: Request, slot: int) -> None:
        s = req.sampling
        hit_seq = None
        if s.stop_sequences:
            for seq in s.stop_sequences:
                n = len(seq)
                if n and len(req.tokens) >= n and (
                        tuple(req.tokens[-n:]) == tuple(seq)):
                    hit_seq = n
                    break
        if len(req.tokens) >= s.max_new_tokens or hit_seq is not None or (
                s.eos_token >= 0 and req.tokens[-1] == s.eos_token) or (
                s.stop_tokens and req.tokens[-1] in s.stop_tokens):
            if hit_seq is not None:  # trim the matched stop suffix
                del req.tokens[-hit_seq:]
                del req.logprobs[len(req.tokens):]
            req.done = True
            if self._slots[slot] is req:  # pipelined bookkeeping runs a block
                self._slots[slot] = None  # behind dispatch — never clobber a
                self._active[slot] = False  # re-admitted slot
                self._slot_guided[slot] = False
                self._slot_state_dirty = True


    def _spec_mode(self) -> Optional[str]:
        """None = no speculation this tick; "greedy" = greedy verify;
        "sample" = rejection sampling (draft model + pure-temperature
        rows only — truncation samplers would need matching truncation
        on both distributions)."""
        if self.ec.speculate <= 0:
            return None
        if self._slot_guided.any():
            return None  # drafted tokens bypass the grammar mask
        live = [i for i, r in enumerate(self._slots) if r is not None]
        if any(self._pens[i] != 1.0 or self._freqs[i] != 0.0
               or self._press[i] != 0.0 or self._minnews[i] > 0
               or self._bias_np[i].any() for i in live):
            return None  # penalized slot: plain decode path
        bound = self.ec.decode_block * (self.ec.speculate + 1) + 1
        if int(self._host_pos[self._active].max()) + bound >= self.ec.max_seq_len:
            return None
        if all(self._temps[i] <= 0 for i in live):
            return "greedy"
        if (self._draft is not None
                and all(self._temps[i] > 0 and self._topks[i] == 0
                        and self._topps[i] >= 1.0 and self._minps[i] <= 0
                        for i in live)):
            return "sample"
        return None

    def _spec_ok(self) -> bool:  # back-compat shim (tests/pre-draft callers)
        return self._spec_mode() == "greedy"

    def _dispatch_block(self):
        """Dispatch one decode block (`decode_block` fused steps); returns
        the device [K, B] token history + the slot snapshot for attribution.
        Does NOT block on the result; device-resident sampling-param mirrors
        are re-staged only when admissions/finishes changed them."""
        if self._slot_state_dirty:
            self._temps_dev = jnp.asarray(self._temps)
            self._topks_dev = jnp.asarray(self._topks)
            self._topps_dev = jnp.asarray(self._topps)
            self._minps_dev = jnp.asarray(self._minps)
            self._pens_dev = jnp.asarray(self._pens)
            self._freqs_dev = jnp.asarray(self._freqs)
            self._press_dev = jnp.asarray(self._press)
            self._plens_dev = jnp.asarray(self._plens)
            self._eos_dev = jnp.asarray(self._eos_ids)
            self._minnews_dev = jnp.asarray(self._minnews)
            self._active_dev = jnp.asarray(self._active)
            self._slot_state_dirty = False
        if self._bias_dirty:
            self._bias_dev = jnp.asarray(self._bias_np)
            self._bias_dirty = False
        if self._guides_dirty:
            self._gmask_dev = jnp.asarray(self._gmask_np)
            self._gtrans_dev = jnp.asarray(self._gtrans_np)
            self._guides_dirty = False
        if self._adapters_dirty:
            self._params_decode = self._lora.set_adapter_ids(
                self.params, self._adapters)
            self._adapters_dirty = False
        self._blk_counter += 1
        kblk = self.ec.decode_block
        window = self.ec.max_seq_len
        if self.ec.attn_windows:
            need = int(self._host_pos[self._active].max()) + kblk + 1
            window = min((w for w in self.ec.attn_windows if w >= need),
                         default=self.ec.max_seq_len)
        mode = self._spec_mode()
        if mode is not None:
            g = self.ec.speculate
            # conservative upper bound; _process_block corrects to actuals
            self._host_pos[self._active] += kblk * (g + 1)
            if mode == "sample":
                dcfg, dparams = self._draft
                self._blk_counter += 1
                spec_fn = _jit_draft_spec_sample(self.cfg, dcfg, kblk, g)
                (emit_hist, emit_lp, n_emit, tok, pos, self.cache,
                 self._dcache) = spec_fn(
                    self._params_decode, dparams, self._cur_tok,
                    self._positions, self.cache, self._dcache,
                    self._temps_dev, self._key, self._blk_counter,
                    self._active_dev)
            elif self._draft is not None:
                dcfg, dparams = self._draft
                spec_fn = _jit_draft_spec_block(self.cfg, dcfg, kblk, g)
                (emit_hist, emit_lp, n_emit, tok, pos, self.cache,
                 self._dcache) = spec_fn(
                    self._params_decode, dparams, self._cur_tok,
                    self._positions, self.cache, self._dcache,
                    self._active_dev)
            else:
                spec_fn = _jit_spec_block(self.cfg, kblk, g)
                (emit_hist, emit_lp, n_emit, tok, pos, self._hist,
                 self.cache) = spec_fn(
                    self._params_decode, self._cur_tok, self._positions,
                    self.cache, self._hist, self._active_dev)
            self._cur_tok = tok
            self._positions = pos
            return ("spec", emit_hist, emit_lp, n_emit), list(self._slots)
        self._host_pos[self._active] += kblk
        pos_before = self._positions
        if self.ec.track_history:
            # history-carrying variant: repetition penalty + min-p applied
            # in-scan; the hist buffer is updated in-graph (no outside
            # append needed)
            block_fn = _jit_decode_block(self.cfg, kblk, window, True)
            (tok_hist, lp_hist, tok, pos, self.cache, self._hist,
             self._gstate) = block_fn(
                self._params_decode, self._cur_tok, self._positions,
                self.cache,
                self._hist, self._temps_dev, self._topks_dev, self._topps_dev,
                self._minps_dev, self._pens_dev, self._freqs_dev,
                self._press_dev, self._plens_dev, self._bias_dev,
                self._eos_dev, self._minnews_dev,
                self._key, self._blk_counter, self._active_dev,
                self._gmask_dev, self._gtrans_dev, self._gstate)
        else:
            block_fn = _jit_decode_block(self.cfg, kblk, window, False)
            tok_hist, lp_hist, tok, pos, self.cache, self._gstate = block_fn(
                self._params_decode, self._cur_tok, self._positions,
                self.cache,
                self._temps_dev, self._topks_dev, self._topps_dev,
                self._minps_dev, self._key, self._blk_counter,
                self._active_dev, self._gmask_dev, self._gtrans_dev,
                self._gstate)
        self._cur_tok = tok
        self._positions = pos
        if (self.ec.speculate > 0 and not self.ec.track_history
                and self._draft is None):
            # keep the speculation history current through non-spec ticks
            # (stale gaps would silently zero the ngram drafting hit-rate;
            # a draft MODEL doesn't read the history)
            self._hist = _jit_hist_append()(self._hist, tok_hist, pos_before,
                                            self._active_dev)
        return ("norm", tok_hist, lp_hist), list(self._slots)

    def _process_block(self, payload, slots_snapshot) -> None:
        """Fetch a previously dispatched block's tokens and do bookkeeping.
        Runs one block BEHIND dispatch so the host readback latency overlaps
        the next block's device compute."""
        if payload[0] == "spec":
            _, emit_hist, emit_lp, n_emit = payload
            emits = np.asarray(emit_hist)   # [K, B, G+1]
            lps = np.asarray(emit_lp)       # [K, B, G+1]
            counts = np.asarray(n_emit)     # [K, B]
            for step in range(emits.shape[0]):
                for i, req in enumerate(slots_snapshot):
                    if req is None or req.done:
                        continue
                    for j in range(counts[step, i]):
                        req.tokens.append(int(emits[step, i, j]))
                        req.logprobs.append(float(lps[step, i, j]))
                        self.metrics.decode_tokens += 1
                        self._maybe_finish(req, i)
                        if req.done:
                            break
                    # correct the conservative position upper bound
                    self._host_pos[i] -= (self.ec.speculate + 1
                                          - int(counts[step, i]))
            return
        toks_np = np.asarray(payload[1])  # [K, B]
        lps_np = np.asarray(payload[2])   # [K, B]
        for step in range(toks_np.shape[0]):
            for i, req in enumerate(slots_snapshot):
                if req is not None and not req.done:
                    req.tokens.append(int(toks_np[step, i]))
                    req.logprobs.append(float(lps_np[step, i]))
                    self.metrics.decode_tokens += 1
                    self._maybe_finish(req, i)

    def _step_decode(self) -> None:
        """Synchronous block step (dispatch + process); the pipelined path
        in run() is preferred — this remains for simple drivers."""
        t0 = time.perf_counter()
        hist, snap = self._dispatch_block()
        self._process_block(hist, snap)
        self.metrics.decode_time_s += time.perf_counter() - t0

    # ------------------------------------------------------------------
    # snapshot / restore (SURVEY §5 failure detection: preemption-safe
    # serving — the training side's checkpoint-restart counterpart)
    # ------------------------------------------------------------------
    _SNAP_HOST = ("_temps", "_topks", "_topps", "_minps", "_pens",
                  "_freqs", "_press", "_plens", "_bias_np",
                  "_eos_ids", "_minnews",
                  "_host_pos", "_active", "_slot_guided", "_adapters",
                  "_gmask_np", "_gtrans_np")

    def snapshot(self) -> dict:
        """Full engine state as a host pytree: KV caches, per-slot sampler
        state, in-flight requests, queue, RNG, metrics, prefix pool.
        Restoring on a fresh Engine (same cfg/params/econfig) resumes
        generation with IDENTICAL tokens (tested).  Call between scheduler
        ticks; a mid-admission chunked prefill cannot be snapshotted."""
        if self._pending_prefill is not None:
            raise ValueError("snapshot mid-admission: drain the pending "
                             "chunked prefill first (one _admit() tick)")
        host = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
        state = {
            "cache": host(self.cache),
            "cur_tok": np.asarray(self._cur_tok),
            "positions": np.asarray(self._positions),
            "key": np.asarray(jax.random.key_data(self._key)),
            "blk_counter": self._blk_counter,
            "slots": self._slots, "queue": list(self._queue),
            "all": self._all, "metrics": self.metrics,
            "prefix_pool": [(k, host(c), eff)
                            for k, (c, eff) in self._prefix_pool.items()],
        }
        if hasattr(self, "_hist"):
            state["hist"] = np.asarray(self._hist)
        if self._draft is not None:
            state["dcache"] = host(self._dcache)
        state["gstate"] = np.asarray(self._gstate)
        for f in self._SNAP_HOST:
            state[f] = getattr(self, f).copy()
        return state

    def restore(self, state: dict) -> None:
        """Load a snapshot() pytree into this (freshly built) engine."""
        dev = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
        self.cache = dev(state["cache"])
        self._cur_tok = jnp.asarray(state["cur_tok"])
        self._positions = jnp.asarray(state["positions"])
        self._key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
        self._blk_counter = state["blk_counter"]
        self._slots = list(state["slots"])
        self._queue = deque(state["queue"])
        self._all = list(state["all"])
        self.metrics = state["metrics"]
        self._prefix_pool = OrderedDict(
            (k, (dev(c), eff)) for k, c, eff in state["prefix_pool"])
        if "hist" in state:
            self._hist = jnp.asarray(state["hist"])
        if "dcache" in state and self._draft is not None:
            self._dcache = dev(state["dcache"])
        self._gstate = jnp.asarray(state["gstate"])
        for f in self._SNAP_HOST:
            setattr(self, f, state[f].copy())
        # combined guide tables restored verbatim; offsets for the restored
        # guide OBJECTS are re-derived from the in-flight requests so new
        # admissions of the same guide reuse their rows
        self._guide_offsets = {}
        for req in list(self._slots) + list(self._queue):
            if req is not None and getattr(req, "guide", None) is not None:
                g = req.guide
                s = g.mask.shape[0]
                for off in range(1, self._gmask_np.shape[0] - s + 1):
                    if ((self._gmask_np[off:off + s] == g.mask).all()
                            and (self._gtrans_np[off:off + s]
                                 == g.trans + off).all()):
                        self._guide_offsets[id(g)] = off
                        break
        self._guides_dirty = True
        self._adapters_dirty = self._n_adapters is not None
        self._bias_dirty = True
        self._slot_state_dirty = True  # device mirrors rebuilt lazily
        self._pending_prefill = None

    def save(self, path: str) -> None:
        """snapshot() to disk (pickle + raw numpy buffers)."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self.snapshot(), f, protocol=4)

    def load(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            self.restore(pickle.load(f))

    # ------------------------------------------------------------------
    def run(self) -> List[Request]:
        """Run until queue and slots drain; returns completed requests.

        Pipelined: each iteration admits, dispatches decode block N, then
        fetches/bookkeeps block N-1 — the token readback (a full host/relay
        round-trip) overlaps the next block's device compute."""
        for _ in self.run_stream():
            pass
        return [r for r in self._all if r.done]

    def run_stream(self):
        """Generator form of run(): yields (request, new_token) pairs as
        each block's tokens are read back, in emission order — the hook
        for token streaming.  Same pipelined schedule as run(); consuming
        the generator drives the engine."""
        pending = None
        while (pending is not None or self._queue
               or any(r is not None for r in self._slots)
               or self._pending_prefill is not None):
            decoding = any(r is not None for r in self._slots)
            # while decoding, bound the per-tick admission work to ONE
            # prefill chunk so in-flight requests keep streaming tokens
            self._admit(max_chunks=1 if (decoding and self.ec.prefill_chunk)
                        else None)
            t0 = time.perf_counter()
            nxt = None
            if any(r is not None for r in self._slots):
                nxt = self._dispatch_block()
            if pending is not None:
                before = {id(r): len(r.tokens) for r in self._all}
                self._process_block(*pending)
                self.metrics.decode_time_s += time.perf_counter() - t0
                for r in self._all:
                    for tok in r.tokens[before.get(id(r), 0):]:
                        yield r, tok
            else:
                self.metrics.decode_time_s += time.perf_counter() - t0
            pending = nxt

    def cancel(self, rid: int) -> bool:
        """Cancel a request by id.  Queued requests are dropped; an
        in-flight request is marked done and its slot freed at the next
        bookkeeping tick (tokens already emitted are kept).  Returns
        False if the id is unknown or already finished."""
        for i, req in enumerate(list(self._queue)):
            if req.rid == rid:
                del self._queue[i]
                req.done = True
                return True
        for i, req in enumerate(self._slots):
            if req is not None and req.rid == rid and not req.done:
                req.done = True
                self._slots[i] = None
                self._active[i] = False
                self._slot_state_dirty = True
                return True
        return False
