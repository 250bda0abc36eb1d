"""INT8-quantized KV cache.

BASELINE.json: "INT8 KV-cache with on-the-fly quant at append + dequant at
attention read".  K and V are stored as int8 codes with a per-(batch, head,
position) symmetric scale (zero_point fixed at 0 — keys/values are
zero-centered; symmetric keeps the attention dot a pure scale multiply).

Shapes (decode-friendly layout, heads leading so attention reads are
contiguous per head):
    k_codes/v_codes : int8  [B, H_kv, S_max, D]
    k_scale/v_scale : f32   [B, H_kv, S_max, 1]

The append path mirrors the reference's quantize hot loop; the read path is
its dequantize with SET store — both fused by XLA into the surrounding
attention; a Pallas fused attention-with-int8-cache kernel can slot in
behind `kv_cache_read` later.
"""

from __future__ import annotations

import dataclasses

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8
_QMAX = 127.0


def _cache_bits(cache: "KVCache") -> int:
    # kv4 codes are nibble-packed in uint8 (see pack4); kv8 codes are int8
    return 4 if cache.k_codes.dtype == jnp.uint8 else 8


def pack4(codes: Array) -> Array:
    """Split-half nibble pack along the last (head_dim) axis: byte i holds
    code i (low nibble) and code i+D/2 (high), both offset-8 ([-7,7] ->
    [1,15]).  Contiguous-slice packing — XLA lane-strided packing runs at
    ~0.6 GB/s on TPU (NOTES.md), the split-half form is free.

    Native jnp.int4 would be the obvious storage, but int4 arrays cannot
    cross a jit boundary on the axon (remote TPU) backend — the arg
    transfer path recurses (probed 2026-08-19).  Explicit packing also
    removes any reliance on XLA choosing to pack sub-byte HBM buffers."""
    d = codes.shape[-1]
    c = (codes.astype(jnp.int32) + 8).astype(jnp.uint8)
    return c[..., : d // 2] | (c[..., d // 2:] << 4)


def unpack4(packed: Array) -> Array:
    """Inverse of pack4: uint8 [..., D/2] -> int8 codes [..., D]."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p >> 4) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k_codes: Array
    v_codes: Array
    k_scale: Array
    v_scale: Array
    length: Array  # int32 scalar: valid positions per batch row [B]

    def tree_flatten(self):
        return (self.k_codes, self.v_codes, self.k_scale, self.v_scale, self.length), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k_codes.shape[2]


def kv_cache_init(batch: int, n_kv_heads: int, max_len: int, head_dim: int,
                  bits: int = 8) -> KVCache:
    """bits=4 stores nibble-packed uint8 codes, [B, H, S, D/2] — half the
    cache bytes/traffic of int8 at a per-(position, head) symmetric-scale
    quality cost; an opt-in memory/long-context knob (see pack4)."""
    if bits not in (4, 8):
        raise ValueError("KV cache bits must be 4 or 8")
    if bits == 4 and head_dim % 2:
        raise ValueError("kv_bits=4 needs an even head_dim")
    dt = jnp.uint8 if bits == 4 else jnp.int8
    cd = head_dim // 2 if bits == 4 else head_dim
    return KVCache(
        k_codes=jnp.zeros((batch, n_kv_heads, max_len, cd), dt),
        v_codes=jnp.zeros((batch, n_kv_heads, max_len, cd), dt),
        k_scale=jnp.zeros((batch, n_kv_heads, max_len, 1), jnp.float32),
        v_scale=jnp.zeros((batch, n_kv_heads, max_len, 1), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _quantize_sym(x: Array, bits: int = 8) -> Tuple[Array, Array]:
    """Symmetric quantization along the last axis (per token+head).
    bits=4 returns nibble-packed uint8 codes ([..., D/2], see pack4)."""
    qmax = _QMAX if bits == 8 else 7.0
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / qmax
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -qmax, qmax)
    if bits == 4:
        return pack4(codes.astype(jnp.int8)), scale
    return codes.astype(jnp.int8), scale


def kv_cache_append(
    cache: KVCache,
    k_new: Array,  # [B, H_kv, T, D] float
    v_new: Array,
    positions: Array,  # [B, T] int32 absolute positions to write
) -> KVCache:
    """Quantize new K/V on the fly and scatter them at `positions`."""
    kc, ks = _quantize_sym(k_new, _cache_bits(cache))
    vc, vs = _quantize_sym(v_new, _cache_bits(cache))

    b = jnp.arange(cache.k_codes.shape[0])[:, None, None]
    h = jnp.arange(cache.k_codes.shape[1])[None, :, None]
    p = positions[:, None, :]  # [B, 1, T]

    k_codes = cache.k_codes.at[b, h, p].set(kc)
    v_codes = cache.v_codes.at[b, h, p].set(vc)
    k_scale = cache.k_scale.at[b, h, p].set(ks)
    v_scale = cache.v_scale.at[b, h, p].set(vs)
    # XLA scatters silently drop out-of-bounds writes; clamp the bookkeeping
    # so `length` can never exceed capacity (callers enforce capacity before
    # appending — the serving engine evicts/refuses beyond max_len).
    new_len = jnp.maximum(cache.length, positions.max(axis=-1) + 1)
    new_len = jnp.minimum(new_len, k_codes.shape[2])
    return KVCache(k_codes, v_codes, k_scale, v_scale, new_len)


def kv_cache_append_stacked(
    cache: KVCache,
    layer: int,
    k_new: Array,  # [B, H_kv, T, D] float
    v_new: Array,
    positions: Array,  # [B, T] int32
    contiguous_start: Optional[Array] = None,  # scalar: all rows write
                                               # [start, start+T) (prefill)
) -> KVCache:
    """Append into layer `layer` of a STACKED cache (leaves [L, B, H, S, D]).

    Scatters directly into the stacked buffers — no per-layer slice-out /
    restack, so XLA aliases the update in place inside a decode loop instead
    of copying the whole multi-GB cache every step (measured: the restack
    pattern cost several ms/step on 8B decode)."""
    kc, ks = _quantize_sym(k_new, _cache_bits(cache))
    vc, vs = _quantize_sym(v_new, _cache_bits(cache))

    new_len = jnp.maximum(cache.length[layer], positions.max(axis=-1) + 1)
    new_len = jnp.minimum(new_len, cache.k_codes.shape[3])

    if contiguous_start is not None:
        # prefill fast path: all rows write [start, start+T) — one
        # dynamic-update-slice per buffer instead of a gather/scatter
        # (measured ~25% faster 8x1024 prefill)
        st = jnp.asarray(contiguous_start, jnp.int32).reshape(())

        def dus(big, upd):
            return jax.lax.dynamic_update_slice(
                big, upd[None].astype(big.dtype),
                (jnp.int32(layer), jnp.int32(0), jnp.int32(0), st, jnp.int32(0)))

        return KVCache(
            k_codes=dus(cache.k_codes, kc),
            v_codes=dus(cache.v_codes, vc),
            k_scale=dus(cache.k_scale, ks),
            v_scale=dus(cache.v_scale, vs),
            length=cache.length.at[layer].set(new_len),
        )

    b = jnp.arange(cache.k_codes.shape[1])[:, None, None]
    h = jnp.arange(cache.k_codes.shape[2])[None, :, None]
    p = positions[:, None, :]  # [B, 1, T]

    return KVCache(
        k_codes=cache.k_codes.at[layer, b, h, p].set(kc),
        v_codes=cache.v_codes.at[layer, b, h, p].set(vc),
        k_scale=cache.k_scale.at[layer, b, h, p].set(ks),
        v_scale=cache.v_scale.at[layer, b, h, p].set(vs),
        length=cache.length.at[layer].set(new_len),
    )


def kv_cache_read(cache: KVCache, dtype=jnp.bfloat16) -> Tuple[Array, Array]:
    """Dequantize the full cache (masking beyond `length` is the caller's
    job via attention masks).  [B, H_kv, S_max, D] each."""
    kc, vc = cache.k_codes, cache.v_codes
    if _cache_bits(cache) == 4:
        kc, vc = unpack4(kc), unpack4(vc)
    k = (kc.astype(jnp.float32) * cache.k_scale).astype(dtype)
    v = (vc.astype(jnp.float32) * cache.v_scale).astype(dtype)
    return k, v


def kv_cache_append_stacked_batch(
    cache: KVCache,
    k_codes: Array,  # [L, B, H, T, D] int8 (already quantized)
    k_scale: Array,  # [L, B, H, T, 1] f32
    v_codes: Array,
    v_scale: Array,
    positions: Array,  # [B, T] int32
) -> KVCache:
    """Write ALL layers' pre-quantized K/V in one scatter per buffer.

    The per-layer decode append costs one scatter kernel per buffer per
    layer (4 x n_layers tiny dispatches/step, ~1.6 ms/step on 8B by
    knockout).  Deferring the appends to the end of the step (the in-layer
    attention adds the current token's contribution from registers instead
    of reading it back from the cache — see llama._attention deferred path)
    batches them into 4 scatters total, which XLA aliases in place."""
    l = jnp.arange(cache.k_codes.shape[0])[:, None, None, None]
    b = jnp.arange(cache.k_codes.shape[1])[None, :, None, None]
    h = jnp.arange(cache.k_codes.shape[2])[None, None, :, None]
    p = positions[None, :, None, :]  # [1, B, 1, T]
    new_len = jnp.maximum(cache.length, positions.max(axis=-1)[None] + 1)
    new_len = jnp.minimum(new_len, cache.k_codes.shape[3])
    return KVCache(
        k_codes=cache.k_codes.at[l, b, h, p].set(
            k_codes.astype(cache.k_codes.dtype)),
        v_codes=cache.v_codes.at[l, b, h, p].set(
            v_codes.astype(cache.v_codes.dtype)),
        k_scale=cache.k_scale.at[l, b, h, p].set(k_scale),
        v_scale=cache.v_scale.at[l, b, h, p].set(v_scale),
        length=new_len,
    )
