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
