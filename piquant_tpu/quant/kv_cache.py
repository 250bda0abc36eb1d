"""INT8/INT4-quantized KV cache.

BASELINE.json: "INT8 KV-cache with on-the-fly quant at append + dequant at
attention read".  K and V are stored as int8 codes with a per-(batch, head,
position) symmetric scale (zero_point fixed at 0 — keys/values are
zero-centered; symmetric keeps the attention dot a pure scale multiply).

Shapes (decode-friendly layout, heads leading so attention reads are
contiguous per head):

  kv8:  k_codes/v_codes : int8  [B, H_kv, S_max,   D]
        k_scale/v_scale : f32   [B, H_kv, S_max,   1]
  kv4:  k_codes/v_codes : uint8 [B, H_kv, S_max/2, D]   (see pack4_pairs)
        k_scale/v_scale : f32   [B, H_kv, 2, S_max/2]   (parity-split)

The kv4 storage packs TWO positions per code row so the last axis stays a
full 128-lane D: row t lanes [0, D/2) hold position 2t's pack4 bytes and
lanes [D/2, D) hold position 2t+1's — Mosaic rejects sub-128-lane blocks
of a stacked cache (a [.., S, D/2] layout capped kv4 to the XLA unpack
path, which materializes the whole int8 cache: 24 ms/step measured).
Scales are stored parity-split ([.., 0, t] = position 2t, [.., 1, t] =
2t+1) so the decode kernel streams them chunk-aligned with the code rows
without a per-step transpose.

The append path mirrors the reference's quantize hot loop; the read path is
its dequantize with SET store — both fused by XLA into the surrounding
attention; the Pallas fused attention-with-quantized-cache kernel
(ops/pallas/decode_attn2.py) consumes the stacked buffers directly.
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


def pack4_pairs(codes: Array) -> Array:
    """[..., T, D] int codes -> [..., T/2, D] uint8 storage rows: pack4
    each position (D/2 bytes), then concatenate position pairs along the
    lane axis.  A pure reshape of the per-position pack4 bytes — row t =
    [pack4(pos 2t) | pack4(pos 2t+1)].  T must be even."""
    t, d = codes.shape[-2], codes.shape[-1]
    if t % 2:
        raise ValueError("pack4_pairs needs an even position count")
    p = pack4(codes)  # [..., T, D/2]
    return p.reshape(*codes.shape[:-2], t // 2, d)


def unpack4_pairs(packed: Array) -> Array:
    """Inverse of pack4_pairs: uint8 [..., S/2, D] -> int8 [..., S, D]."""
    sp, d = packed.shape[-2], packed.shape[-1]
    return unpack4(packed.reshape(*packed.shape[:-2], 2 * sp, d // 2))


def split_scale_pairs(scale: Array) -> Array:
    """Per-position scales [..., T, 1] -> parity-split [..., 2, T/2]
    ([..., 0, t] = position 2t, [..., 1, t] = 2t+1)."""
    t = scale.shape[-2]
    s2 = scale.reshape(*scale.shape[:-2], t // 2, 2)
    return jnp.swapaxes(s2, -1, -2)


def merge_scale_pairs(scale2: Array) -> Array:
    """Inverse of split_scale_pairs: [..., 2, S/2] -> [..., S, 1]."""
    sp = scale2.shape[-1]
    s = jnp.swapaxes(scale2, -1, -2)  # [..., S/2, 2]
    return s.reshape(*scale2.shape[:-2], 2 * sp, 1)


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
        return cache_max_len(self)


def cache_max_len(cache: KVCache) -> int:
    """Positions of capacity — layout-aware (kv4 stores S/2 code rows)."""
    if _cache_bits(cache) == 4:
        return cache.k_scale.shape[-1] * 2  # [..., 2, S/2]
    return cache.k_codes.shape[-2]


def kv_cache_init(batch: int, n_kv_heads: int, max_len: int, head_dim: int,
                  bits: int = 8) -> KVCache:
    """bits=4 stores pair-packed uint8 codes, [B, H, S/2, D] — half the
    cache bytes/traffic of int8 at a per-(position, head) symmetric-scale
    quality cost (see pack4_pairs for the layout)."""
    if bits not in (4, 8):
        raise ValueError("KV cache bits must be 4 or 8")
    if bits == 4 and head_dim % 2:
        raise ValueError("kv_bits=4 needs an even head_dim")
    if bits == 4 and max_len % 2:
        raise ValueError("kv_bits=4 needs an even max_len")
    if bits == 4:
        return KVCache(
            k_codes=jnp.zeros((batch, n_kv_heads, max_len // 2, head_dim), jnp.uint8),
            v_codes=jnp.zeros((batch, n_kv_heads, max_len // 2, head_dim), jnp.uint8),
            k_scale=jnp.zeros((batch, n_kv_heads, 2, max_len // 2), jnp.float32),
            v_scale=jnp.zeros((batch, n_kv_heads, 2, max_len // 2), jnp.float32),
            length=jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        k_codes=jnp.zeros((batch, n_kv_heads, max_len, head_dim), jnp.int8),
        v_codes=jnp.zeros((batch, n_kv_heads, max_len, head_dim), jnp.int8),
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


def _scatter4(codes_buf: Array, scale_buf: Array, pc: Array, ps: Array,
              positions: Array, layer: Optional[int] = None
              ) -> Tuple[Array, Array]:
    """Scatter per-position pack4 codes [.., T, D/2] + scales [.., T, 1]
    at `positions` [B, T] into the pair-packed kv4 buffers.

    Code position p lands in row p//2, lane half p%2; scale in plane p%2,
    column p//2.  pc 5-D = all-layer batch write into stacked buffers;
    pc 4-D with `layer` = one layer of a stacked buffer; pc 4-D without
    = unstacked [B, H, ..] buffers."""
    hd2 = pc.shape[-1]
    nb, nh, t = pc.shape[-4], pc.shape[-3], pc.shape[-2]
    d = codes_buf.shape[-1]
    srows = codes_buf.shape[-2]
    b = jnp.arange(nb).reshape(nb, 1, 1, 1)
    h = jnp.arange(nh).reshape(1, nh, 1, 1)
    pr = (positions // 2).reshape(nb, 1, t, 1)
    par = (positions % 2).reshape(nb, 1, t, 1)

    # Codes go in ROW-level: gather the target pair-row, merge the new
    # position's lane half in registers, scatter the whole row back.  The
    # natural formulation (computed per-lane index on the minor dim)
    # lowers to a per-ELEMENT XLA scatter — measured 12 ms/step on the 8B
    # decode append vs ~0.6 for the kv8 row scatter (r5).  Same-row
    # collisions (even+odd of one pair in one call) are handled by one
    # pass per parity; each pass routes its non-members out of bounds,
    # which XLA scatter silently drops.  t == 1 cannot collide -> 1 pass.
    pos2 = positions.reshape(nb, t).astype(jnp.int32)
    pr_bt, par_bt = pos2 // 2, pos2 % 2
    stacked_all = pc.ndim == 5
    if stacked_all:
        nl = codes_buf.shape[0]
        sh = (nl, nb, nh, t)
        cidx = (jnp.arange(nl).reshape(nl, 1, 1, 1),
                jnp.arange(nb).reshape(1, nb, 1, 1),
                jnp.arange(nh).reshape(1, 1, nh, 1))
        pr_c = jnp.broadcast_to(pr_bt.reshape(1, nb, 1, t), sh)
        sel_shape = (1, nb, 1, t)
    else:
        sh = (nb, nh, t)
        cidx = ((jnp.arange(nb).reshape(nb, 1, 1),
                 jnp.arange(nh).reshape(1, nh, 1))
                if layer is None else
                (layer,
                 jnp.arange(nb).reshape(nb, 1, 1),
                 jnp.arange(nh).reshape(1, nh, 1)))
        pr_c = jnp.broadcast_to(pr_bt.reshape(nb, 1, t), sh)
        sel_shape = (nb, 1, t)
    lane_half = (jnp.arange(d, dtype=jnp.int32) // hd2).reshape(
        *([1] * len(sh)), d)
    par_c = par_bt.reshape(*sel_shape, 1)
    tiled = jnp.concatenate([pc, pc], axis=-1).astype(codes_buf.dtype)

    codes = codes_buf
    for pv in ((None,) if t == 1 else (0, 1)):
        old = codes[(*cidx, pr_c)]
        newrow = jnp.where(lane_half == par_c, tiled, old)
        if pv is None:
            pr_eff = pr_c
        else:
            sel = jnp.broadcast_to((par_bt == pv).reshape(sel_shape), sh)
            pr_eff = jnp.where(sel, pr_c, srows)   # OOB rows are dropped
        codes = codes.at[(*cidx, pr_eff)].set(newrow)

    # Scales stay per-element (one f32 cell per position): tiny updates
    if stacked_all:
        li = jnp.arange(nl).reshape(nl, 1, 1, 1, 1)
        scales = scale_buf.at[li, b[None], h[None], par[None],
                              pr[None]].set(ps)
    elif layer is not None:
        scales = scale_buf.at[layer, b, h, par, pr].set(ps)
    else:
        scales = scale_buf.at[b, h, par, pr].set(ps)
    return codes, scales


def kv_cache_append(
    cache: KVCache,
    k_new: Array,  # [B, H_kv, T, D] float
    v_new: Array,
    positions: Array,  # [B, T] int32 absolute positions to write
) -> KVCache:
    """Quantize new K/V on the fly and scatter them at `positions`."""
    bits = _cache_bits(cache)
    kc, ks = _quantize_sym(k_new, bits)
    vc, vs = _quantize_sym(v_new, bits)
    # XLA scatters silently drop out-of-bounds writes; clamp the bookkeeping
    # so `length` can never exceed capacity (callers enforce capacity before
    # appending — the serving engine evicts/refuses beyond max_len).
    new_len = jnp.maximum(cache.length, positions.max(axis=-1) + 1)
    new_len = jnp.minimum(new_len, cache_max_len(cache))

    if bits == 4:
        k_codes, k_scale = _scatter4(cache.k_codes, cache.k_scale, kc, ks,
                                     positions)
        v_codes, v_scale = _scatter4(cache.v_codes, cache.v_scale, vc, vs,
                                     positions)
        return KVCache(k_codes, v_codes, k_scale, v_scale, new_len)

    b = jnp.arange(cache.k_codes.shape[0])[:, None, None]
    h = jnp.arange(cache.k_codes.shape[1])[None, :, None]
    p = positions[:, None, :]  # [B, 1, T]

    k_codes = cache.k_codes.at[b, h, p].set(kc)
    v_codes = cache.v_codes.at[b, h, p].set(vc)
    k_scale = cache.k_scale.at[b, h, p].set(ks)
    v_scale = cache.v_scale.at[b, h, p].set(vs)
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
    bits = _cache_bits(cache)
    kc, ks = _quantize_sym(k_new, bits)
    vc, vs = _quantize_sym(v_new, bits)

    new_len = jnp.maximum(cache.length[layer], positions.max(axis=-1) + 1)
    new_len = jnp.minimum(new_len, cache_max_len(cache))

    t = k_new.shape[2]
    if contiguous_start is not None and (bits == 8 or t % 2 == 0):
        # prefill fast path: all rows write [start, start+T) — one
        # dynamic-update-slice per buffer instead of a gather/scatter
        # (measured ~25% faster 8x1024 prefill).  kv4 needs an even start
        # (pair-packed rows); odd starts take the scatter path below via
        # lax.cond — both branches compile, the predicate picks at runtime.
        st = jnp.asarray(contiguous_start, jnp.int32).reshape(())

        def dus(big, upd, start, pos_axis=3):
            idx = [jnp.int32(layer)] + [jnp.int32(0)] * (big.ndim - 1)
            idx[pos_axis] = start
            return jax.lax.dynamic_update_slice(
                big, upd[None].astype(big.dtype), tuple(idx))

        if bits == 4:
            def even_case(args):
                kcb, vcb, ksb, vsb = args
                kc2 = kc.reshape(*kc.shape[:-2], t // 2, kc.shape[-1] * 2)
                vc2 = vc.reshape(*vc.shape[:-2], t // 2, vc.shape[-1] * 2)
                return (dus(kcb, kc2, st // 2),
                        dus(vcb, vc2, st // 2),
                        dus(ksb, split_scale_pairs(ks), st // 2, pos_axis=4),
                        dus(vsb, split_scale_pairs(vs), st // 2, pos_axis=4))

            def odd_case(args):
                kcb, vcb, ksb, vsb = args
                kc2, ks2 = _scatter4(kcb, ksb, kc, ks, positions, layer=layer)
                vc2, vs2 = _scatter4(vcb, vsb, vc, vs, positions, layer=layer)
                return kc2, vc2, ks2, vs2

            kcb, vcb, ksb, vsb = jax.lax.cond(
                st % 2 == 0, even_case, odd_case,
                (cache.k_codes, cache.v_codes, cache.k_scale, cache.v_scale))
            return KVCache(kcb, vcb, ksb, vsb,
                           cache.length.at[layer].set(new_len))

        return KVCache(
            k_codes=dus(cache.k_codes, kc, st),
            v_codes=dus(cache.v_codes, vc, st),
            k_scale=dus(cache.k_scale, ks, st),
            v_scale=dus(cache.v_scale, vs, st),
            length=cache.length.at[layer].set(new_len),
        )

    if bits == 4:
        k_codes, k_scale = _scatter4(cache.k_codes, cache.k_scale, kc, ks,
                                     positions, layer=layer)
        v_codes, v_scale = _scatter4(cache.v_codes, cache.v_scale, vc, vs,
                                     positions, layer=layer)
        return KVCache(k_codes, v_codes, k_scale, v_scale,
                       cache.length.at[layer].set(new_len))

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
    ks, vs = cache.k_scale, cache.v_scale
    if _cache_bits(cache) == 4:
        kc, vc = unpack4_pairs(kc), unpack4_pairs(vc)
        ks, vs = merge_scale_pairs(ks), merge_scale_pairs(vs)
    k = (kc.astype(jnp.float32) * ks).astype(dtype)
    v = (vc.astype(jnp.float32) * vs).astype(dtype)
    return k, v


def kv_cache_append_stacked_batch(
    cache: KVCache,
    k_codes: Array,  # [L, B, H, T, D] int8, or [L, B, H, T, D/2] uint8
                     # per-position pack4 codes (kv4) — already quantized
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
    new_len = jnp.maximum(cache.length, positions.max(axis=-1)[None] + 1)
    new_len = jnp.minimum(new_len, cache_max_len(cache))

    if _cache_bits(cache) == 4:
        kc, ks = _scatter4(cache.k_codes, cache.k_scale, k_codes, k_scale,
                           positions)
        vc, vs = _scatter4(cache.v_codes, cache.v_scale, v_codes, v_scale,
                           positions)
        return KVCache(kc, vc, ks, vs, new_len)

    l = jnp.arange(cache.k_codes.shape[0])[:, None, None, None]
    b = jnp.arange(cache.k_codes.shape[1])[None, :, None, None]
    h = jnp.arange(cache.k_codes.shape[2])[None, None, :, None]
    p = positions[None, :, None, :]  # [1, B, 1, T]
    return KVCache(
        k_codes=cache.k_codes.at[l, b, h, p].set(
            k_codes.astype(cache.k_codes.dtype)),
        v_codes=cache.v_codes.at[l, b, h, p].set(
            v_codes.astype(cache.v_codes.dtype)),
        k_scale=cache.k_scale.at[l, b, h, p].set(k_scale),
        v_scale=cache.v_scale.at[l, b, h, p].set(v_scale),
        length=new_len,
    )
