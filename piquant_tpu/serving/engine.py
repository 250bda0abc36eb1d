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
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.quant.kv_cache import KVCache
from piquant_tpu.serving.sampler import SamplingParams, sample, sample_batch

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    batch_slots: int = 8
    max_seq_len: int = 2048
    prefill_pad: int = 64      # prompts are right-padded to a multiple of this
                               # to bound the number of compiled prefill shapes
    prefill_chunk: Optional[int] = None
    # When set, prompts are prefilled in fixed-size chunks attending against
    # the (INT8) cache — ONE compiled prefill shape regardless of prompt
    # length, and the scheduler can interleave other work between chunks.
    # Chunks after the first read back quantized K/V (tiny quality cost).


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    sampling: SamplingParams = SamplingParams()
    # filled by the engine:
    tokens: List[int] = dataclasses.field(default_factory=list)
    ttft_s: Optional[float] = None
    submitted_at: float = 0.0
    done: bool = False


@dataclasses.dataclass
class EngineMetrics:
    decode_tokens: int = 0
    decode_time_s: float = 0.0
    prefill_tokens: int = 0
    prefill_time_s: float = 0.0
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
        }

    def emit(self, path: str) -> None:
        """Append one JSON line to `path`."""
        import json
        import time as _t

        with open(path, "a") as f:
            f.write(json.dumps({"ts": _t.time(), **self.to_dict()}) + "\n")


class Engine:
    def __init__(self, cfg: M.LlamaConfig, params: Dict, econfig: EngineConfig,
                 *, rng_seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.ec = econfig
        self.metrics = EngineMetrics()
        self._queue: deque[Request] = deque()
        self._all: List[Request] = []
        self._slots: List[Optional[Request]] = [None] * econfig.batch_slots
        self._key = jax.random.key(rng_seed)

        b = econfig.batch_slots
        self.cache = M.init_kv_cache(cfg, b, max_len=econfig.max_seq_len)
        self._cur_tok = jnp.zeros((b,), jnp.int32)
        self._positions = jnp.zeros((b,), jnp.int32)
        self._active = np.zeros((b,), bool)  # host-side mask

        # per-slot sampling params mirrored as arrays so ONE fused
        # decode+sample dispatch serves any per-request mix (and only the
        # [B] token vector crosses the host boundary each step)
        self._temps = np.zeros((b,), np.float32)
        self._topks = np.zeros((b,), np.int32)
        self._topps = np.ones((b,), np.float32)

        # --- jitted device programs -------------------------------------
        @jax.jit
        def _decode(params, tok, pos, cache):
            logits, cache = M.decode_step(cfg, params, tok, pos, cache)
            return logits, cache

        self._decode = _decode

        @jax.jit
        def _decode_sample(params, tok, pos, cache, temps, topks, topps, key):
            logits, cache = M.decode_step(cfg, params, tok, pos, cache)
            toks = sample_batch(logits, temps, topks, topps, key)
            return toks, cache

        self._decode_sample = _decode_sample

        # prefill computes a fresh single-sequence cache then scatters it
        # into the pool slot (one compile per padded prompt length)
        def _prefill(params, tokens, true_len, slot, cache, pool_cache):
            # lm_head projected only at the prompt's true last position
            # (tokens are right-padded) — the full [B,T,V] logits tensor
            # would dominate prefill memory
            last, cache1 = M.prefill(cfg, params, tokens, cache,
                                     last_positions=true_len - 1)

            def insert(big, small):
                return jax.lax.dynamic_update_slice_in_dim(big, small, slot, axis=1)

            new_pool = jax.tree.map(insert, pool_cache, cache1)
            return last, new_pool

        self._prefill = jax.jit(_prefill, static_argnames=())

        # chunked prefill: one step per fixed-size chunk against a fresh
        # single-slot cache; returns logits at `last_pos` (valid only on the
        # final chunk) and the updated cache
        def _prefill_chunk(params, tokens, offset, last_pos, cache):
            b, c = tokens.shape
            positions = offset[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
            logits, cache = M.forward(cfg, params, tokens, positions=positions,
                                      cache=cache, logit_positions=last_pos,
                                      kv_write_start=offset[0])
            return logits[:, 0], cache

        self._prefill_chunk = jax.jit(_prefill_chunk)

        def _insert_slot(pool_cache, cache1, slot):
            def insert(big, small):
                return jax.lax.dynamic_update_slice_in_dim(big, small, slot, axis=1)
            return jax.tree.map(insert, pool_cache, cache1)

        self._insert_slot = jax.jit(_insert_slot)

    # ------------------------------------------------------------------
    def submit(self, req: Request) -> None:
        if not req.prompt:
            raise ValueError(f"request {req.rid}: prompt must be non-empty")
        req.submitted_at = time.perf_counter()
        self._queue.append(req)
        self._all.append(req)

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self._slots):
            if r is None:
                return i
        return None

    def _admit(self) -> None:
        while self._queue:
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
            fresh = M.init_kv_cache(self.cfg, 1, max_len=self.ec.max_seq_len)
            if self.ec.prefill_chunk:
                c = self.ec.prefill_chunk
                pad = -plen % c
                padded = req.prompt + [0] * pad
                last = None
                for i in range(0, len(padded), c):
                    is_final = i + c >= len(padded)
                    lp = jnp.asarray([plen - 1 - i if is_final else 0], jnp.int32)
                    last, fresh = self._prefill_chunk(
                        self.params, jnp.asarray([padded[i:i + c]], jnp.int32),
                        jnp.asarray([i], jnp.int32), lp, fresh)
                self.cache = self._insert_slot(self.cache, fresh, slot)
            else:
                pad = -plen % self.ec.prefill_pad or 0
                padded = req.prompt + [0] * pad
                toks = jnp.asarray([padded], jnp.int32)
                last, self.cache = self._prefill(
                    self.params, toks, jnp.asarray([plen], jnp.int32),
                    slot, fresh, self.cache)
            # fix slot length bookkeeping: padded positions wrote scales too,
            # but attention masks beyond `position` ignore them
            tok = self._sample(last, req)
            self._record_first_token(req, tok, slot, plen, t0)

    def _sample(self, logits: Array, req: Request) -> int:
        self._key, k = jax.random.split(self._key)
        t = sample(logits, req.sampling, k)
        return int(t[0]) if t.shape[0] == 1 else int(t)

    def _record_first_token(self, req: Request, tok: int, slot: int,
                            plen: int, t0: float) -> None:
        now = time.perf_counter()
        req.ttft_s = now - req.submitted_at
        self.metrics.ttfts.append(req.ttft_s)
        self.metrics.prefill_tokens += plen
        self.metrics.prefill_time_s += now - t0
        req.tokens.append(tok)
        self._slots[slot] = req
        self._active[slot] = True
        self._temps[slot] = req.sampling.temperature
        self._topks[slot] = req.sampling.top_k
        self._topps[slot] = req.sampling.top_p
        self._cur_tok = self._cur_tok.at[slot].set(tok)
        self._positions = self._positions.at[slot].set(plen)
        self._maybe_finish(req, slot)

    def _maybe_finish(self, req: Request, slot: int) -> None:
        s = req.sampling
        if len(req.tokens) >= s.max_new_tokens or (
                s.eos_token >= 0 and req.tokens[-1] == s.eos_token):
            req.done = True
            self._slots[slot] = None
            self._active[slot] = False

    def _step_decode(self) -> None:
        t0 = time.perf_counter()
        self._key, k = jax.random.split(self._key)
        toks, self.cache = self._decode_sample(
            self.params, self._cur_tok, self._positions, self.cache,
            jnp.asarray(self._temps), jnp.asarray(self._topks),
            jnp.asarray(self._topps), k)
        n_active = int(self._active.sum())
        # ONE fused decode+sample dispatch; only the [B] token vector crosses
        # the host boundary (per-slot host sampling cost B transfers/step)
        toks_np = np.asarray(toks)
        self._cur_tok = toks
        self._positions = self._positions + jnp.asarray(self._active, jnp.int32)
        self.metrics.decode_tokens += n_active
        self.metrics.decode_time_s += time.perf_counter() - t0
        for i, req in enumerate(list(self._slots)):
            if req is not None:
                req.tokens.append(int(toks_np[i]))
                self._maybe_finish(req, i)

    # ------------------------------------------------------------------
    def run(self) -> List[Request]:
        """Run until queue and slots drain; returns completed requests."""
        self._admit()
        while any(r is not None for r in self._slots) or self._queue:
            self._step_decode()
            self._admit()
        return [r for r in self._all if r.done]
