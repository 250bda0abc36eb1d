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
    max_new_tokens: int = 128
    eos_token: int = -1        # -1 => never stops on EOS


def sample(logits: Array, params: SamplingParams, key: Optional[Array]) -> Array:
    """logits [B, V] -> tokens [B] (static params => one compiled variant
    per distinct SamplingParams, like the kernel dispatch elsewhere)."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32) / params.temperature
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


def sample_batch(
    logits: Array,       # [B, V]
    temperature: Array,  # [B] f32; <= 0 => greedy for that row
    top_k: Array,        # [B] i32; 0 => disabled
    top_p: Array,        # [B] f32; >= 1 => disabled
    key: Array,
) -> Array:
    """Per-row sampling params as TRACED arrays -> one compiled variant
    serves every mix of per-slot settings (the continuous-batching engine
    calls this once per decode step; per-request `SamplingParams` changes
    never trigger a recompile)."""
    b, v = logits.shape
    l = logits.astype(jnp.float32)
    greedy = temperature <= 0.0
    lt = l / jnp.maximum(temperature, 1e-6)[:, None]

    # top-k with per-row k: threshold = k-th largest (k=0 -> keep all)
    sorted_asc = jnp.sort(lt, axis=-1)
    eff_k = jnp.where(top_k > 0, jnp.minimum(top_k, v), v)
    kth = jnp.take_along_axis(sorted_asc, (v - eff_k)[:, None], axis=-1)
    lt = jnp.where(lt < kth, -jnp.inf, lt)

    # top-p with per-row p: smallest prefix of the sorted distribution with
    # cumulative mass >= p (p >= 1 -> keep all)
    sorted_desc = sorted_asc[:, ::-1]
    probs = jax.nn.softmax(jnp.where(sorted_desc < kth, -jnp.inf, sorted_desc),
                           axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.argmax(cum >= top_p[:, None], axis=-1)
    cutoff = jnp.take_along_axis(sorted_desc, cutoff_idx[:, None], axis=-1)
    cutoff = jnp.where((top_p >= 1.0)[:, None], -jnp.inf, cutoff)
    lt = jnp.where(lt < cutoff, -jnp.inf, lt)

    drawn = jax.random.categorical(key, lt, axis=-1)
    return jnp.where(greedy, jnp.argmax(l, axis=-1), drawn).astype(jnp.int32)
