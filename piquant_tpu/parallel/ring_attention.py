"""Ring attention: sequence-parallel exact attention over an ICI ring.

Closes SURVEY §2.3's one absent strategy (SP/long-context).  Tokens are
sharded over a mesh axis (each device owns a contiguous block of
positions); K/V blocks rotate around the ring with `lax.ppermute` while
every device folds each visiting block into a running online-softmax
accumulator (the flash-attention (m, l, acc) recurrence, here across
devices instead of tiles).  After P hops every device holds the exact
causally-masked attention output for its own query block — the full K/V
never materializes on any one chip, so context length scales with the
ring size.

The K/V wire can optionally ride the quantized collectives' INT8 format:
per-(position, head) symmetric scales travel with the codes, the same
scheme as the INT8 KV cache (quant/kv_cache.py) — ring hops then cost
1/2 the bf16 bytes.

All functions run INSIDE shard_map (they use axis_name).  Causality uses
ABSOLUTE positions, so any contiguous block partition works (the standard
zig-zag load-balanced partition is a caller-side permutation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _ring_perm(axis_name: str):
    n = lax.axis_size(axis_name)
    return [(i, (i + 1) % n) for i in range(n)]


def _block_scores(q: Array, k: Array, scale: float) -> Array:
    # q [B,H,Tq,D] x k [B,H,Tk,D] -> [B,H,Tq,Tk] f32
    return jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.bfloat16),
                      k.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * scale


def ring_attention(
    q: Array,             # [B, H, Tq, D] this device's query block
    k: Array,             # [B, H, Tk, D] this device's key block
    v: Array,             # [B, H, Tk, D] this device's value block
    q_positions: Array,   # [Tq] absolute positions of the query rows
    kv_positions: Array,  # [Tk] absolute positions of the local K/V rows
    axis_name: str,
    *,
    scale: Optional[float] = None,
    quantized_wire: bool = False,
) -> Array:
    """Exact causal attention with K/V ring rotation; call inside shard_map.

    Returns [B, H, Tq, D] f32 — identical (to float tolerance) to running
    full attention over the gathered sequence.  `quantized_wire` sends
    INT8-quantized K/V between devices (per-(position, head) symmetric
    scales ride along), halving ICI bytes at int8-KV-cache accuracy."""
    p = lax.axis_size(axis_name)
    b, h, tq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    perm = _ring_perm(axis_name)

    def quant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8), s

    def dequant(c, s):
        return c.astype(jnp.float32) * s

    if quantized_wire:
        kc, ks = quant(k)
        vc, vs = quant(v)
        blk = (kc, ks, vc, vs, kv_positions)
    else:
        blk = (k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), kv_positions)

    m0 = jnp.full((b, h, tq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, tq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, tq, d), jnp.float32)

    def fold(carry, blk):
        m, l, acc = carry
        if quantized_wire:
            kc, ks, vc, vs, kp = blk
            kb = dequant(kc, ks)
            vb = dequant(vc, vs)
        else:
            kb, vb, kp = blk
        s = _block_scores(q, kb, scale)
        mask = kp[None, None, None, :] <= q_positions[None, None, :, None]
        s = jnp.where(mask, s, -jnp.inf)
        bm = jnp.max(s, axis=-1, keepdims=True)          # may be -inf
        m2 = jnp.maximum(m, bm)
        msafe = jnp.where(jnp.isfinite(m2), m2, 0.0)     # all-masked rows
        e = jnp.exp(s - msafe)
        e = jnp.where(mask, e, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - msafe), 0.0)
        l2 = l * corr + jnp.sum(e, axis=-1, keepdims=True)
        acc2 = acc * corr + jnp.einsum(
            "bhts,bhsd->bhtd", e.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        return (m2, l2, acc2), None

    carry = (m0, l0, acc0)
    for _ in range(p):
        carry, _ = fold(carry, blk)
        blk = jax.tree.map(lambda a: lax.ppermute(a, axis_name, perm), blk)
    m, l, acc = carry
    return acc / jnp.maximum(l, 1e-30)


def sp_prefill_attention(
    q: Array, k: Array, v: Array,
    shard_positions: Array,  # [T_local] absolute positions of this shard
    axis_name: str,
    *,
    scale: Optional[float] = None,
    quantized_wire: bool = False,
) -> Array:
    """Causal self-attention for a sequence-sharded prefill block
    (q, k, v all [B, H, T_local, D] for the same positions)."""
    return ring_attention(q, k, v, shard_positions, shard_positions,
                          axis_name, scale=scale,
                          quantized_wire=quantized_wire)
