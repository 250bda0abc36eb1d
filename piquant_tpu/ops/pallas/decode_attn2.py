"""Flash-decode attention v2: live-length cache reads, packed-kv4 unpack
in-register, one MXU dot per phase.

Why the XLA int8-cache attention path is not enough (VERDICT round-1 #1):
it reads the FULL padded cache every step — at B=8, ctx 1024, max_len
2048 that is 1.07 GB/step against a 0.54 GB live prefix (the in-model
attention knockout measures 3.39 ms of a 9.7 ms step).  And the kv4
nibble-packed cache is unusable there: XLA materializes the unpacked
int8 cache to HBM (measured 24 ms/step — 2.5x WORSE than kv8).

This kernel fixes all three structural costs at once:

  * Live-length reads with a STATIC grid: the K/V/scale BlockSpec
    index_maps clamp the chunk index to the last live chunk per batch row
    (scalar-prefetched positions).  Pallas elides the DMA when the block
    index repeats, so dead chunks cost nothing; compute is skipped with
    pl.when.  No recompile as the sequence grows (unlike window buckets).
  * kv4 unpack IN-REGISTER: packed uint8 codes stream at D/2 bytes per
    position and expand to int8 inside VMEM (lane concat of the two
    nibble halves — the split-half layout pack4 writes).
  * One (Hkv*rep, D) x (D, Hkv*sc) MXU dot per phase instead of a
    dot_general batched over kv heads (rep=4-row matmuls are MXU
    latency-bound — the v1 kernel in attention.py measured 228 us/layer
    against XLA's 33 for this reason).  Cross-head score blocks are
    masked out with a 2-D iota compare; per-(head, position) scales ride
    a lane-concat row vector.

The kernel returns the UNNORMALIZED flash state (acc, m, l) so the
deferred-append decode path can fold the current token's contribution
(and GPT-OSS sink logits) into the softmax outside, exactly like the
XLA split-softmax it replaces (llama._attention).

Mask semantics are the deferred-append ones: cache position p
contributes iff start <= p < pos (strict causal; `starts` carries the
per-row window start for sliding-window / chunked-attention layers,
0 = full prefix) — the current token is NOT in the cache.  Reference anchor: this is the dequantize-ADD read path of
SURVEY §2 fused into the attention consumer, the "fused dequant+matmul
at HBM speed-of-light" BASELINE north star applied to the KV stream.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

S_CHUNK = 512
NEG_INF = -1e30


@lru_cache(maxsize=None)
def _kernel(b: int, hkv: int, rep: int, s: int, d: int, sc: int,
            kv_bits: int, scale: float, layer: int = -1,
            interpret: bool = False):
    """layer >= 0: code operands are the STACKED cache [L, B, Hkv, S, cd]
    and blocks select (layer, bi, ...) — XLA cannot fuse a slice into a
    custom call, so per-layer sliced operands cost a full cache copy per
    layer per step (measured +3 ms on 8B decode); stacked blocks read the
    cache buffer in place."""
    nsc = s // sc
    hr = hkv * rep
    cd = d // 2 if kv_bits == 4 else d   # stored code columns

    def unpack_bf16(codes):
        """(rows, cd) stored codes -> (rows, d) bf16.

        kv8: int8 -> bf16 via i32 (Mosaic lacks the direct cast).
        kv4: offset-8 nibbles -> int8 halves, lane-concat (split-half
        layout: byte j holds code j and code j + d/2)."""
        if kv_bits == 8:
            return codes.astype(jnp.int32).astype(jnp.bfloat16)
        p = codes.astype(jnp.int32)
        lo = (p & 15) - 8
        hi = (p >> 4) - 8
        return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)

    def kern(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
             acc_out, m_out, l_out, m_ref, l_ref, acc_ref):
        bi = pl.program_id(0)
        sci = pl.program_id(1)
        if layer >= 0:   # stacked blocks carry a leading (1,) layer axis
            kc_ref, vc_ref = kc_ref.at[0], vc_ref.at[0]

        @pl.when(sci == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pos = pos_ref[0, bi]
        start = pos_ref[1, bi]   # first attended cache index (window start)
        s0 = sci * sc

        # live window in this chunk?  (start <= idx < pos overlaps
        # [s0, s0 + sc))
        @pl.when((s0 < pos) & (s0 + sc > start))
        def _():
            q_all = q_ref[0].reshape(hr, d)                  # (hr, d) bf16
            kb = unpack_bf16(kc_ref[0].reshape(hkv * sc, cd))  # (hkv*sc, d)
            scores = jax.lax.dot_general(
                q_all, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (hr, hkv*sc)

            # per-(head, position) K scales, one lane-concat row vector
            ks_row = jnp.concatenate(
                [ks_ref[0, h] for h in range(hkv)], axis=-1)  # (1, hkv*sc)
            scores = scores * (ks_row * scale)

            # valid = strict causal (idx < pos) AND same-head block
            col = jax.lax.broadcasted_iota(jnp.int32, (hr, hkv * sc), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (hr, hkv * sc), 0)
            sc32, rep32 = jnp.int32(sc), jnp.int32(rep)  # x64-safe
            idx = jax.lax.rem(col, sc32) + jnp.int32(s0)
            ok = (idx >= start) & (idx < pos) & (col // sc32 == row // rep32)
            scores = jnp.where(ok, scores, NEG_INF)

            m_old = m_ref[:]                                  # (hr, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
            p = jnp.exp(scores - m_new)                       # (hr, hkv*sc)
            corr = jnp.exp(m_old - m_new)
            l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new

            vs_row = jnp.concatenate(
                [vs_ref[0, h] for h in range(hkv)], axis=-1)  # (1, hkv*sc)
            pv = (p * vs_row).astype(jnp.bfloat16)
            vb = unpack_bf16(vc_ref[0].reshape(hkv * sc, cd))  # (hkv*sc, d)
            acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
                pv, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (hr, d)

        @pl.when(sci == nsc - 1)
        def _():
            acc_out[0] = acc_ref[:].reshape(hkv, rep, d)
            m_out[0] = m_ref[:].reshape(hkv, rep, 1)
            l_out[0] = l_ref[:].reshape(hkv, rep, 1)

    def live_chunk(bi, sci, p):
        """Clamp the chunk index to [start chunk, last live chunk]: dead
        leading chunks (below the sliding-window start) and dead trailing
        chunks (at/after the live length) repeat a block index, so Pallas
        elides their DMAs — windowed decode reads only the window."""
        last = jnp.maximum(p[0, bi] - jnp.int32(1), 0) // jnp.int32(sc)
        first = p[1, bi] // jnp.int32(sc)
        return jnp.clip(sci, jnp.minimum(first, last), last)

    if layer >= 0:
        def kv_map(bi, sci, p):
            return (layer, bi, 0, live_chunk(bi, sci, p), 0)
        kv_block = (1, 1, hkv, sc, cd)
    else:
        def kv_map(bi, sci, p):
            return (bi, 0, live_chunk(bi, sci, p), 0)
        kv_block = (1, hkv, sc, cd)

    def sc_map(bi, sci, p):
        return (bi, 0, 0, live_chunk(bi, sci, p))

    grid = (b, nsc)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, rep, 1), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hkv, rep, d), lambda bi, sci, p: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(kv_block, kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, 1, sc), sc_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(kv_block, kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, 1, sc), sc_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, hkv, rep, d), lambda bi, sci, p: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, rep, 1), lambda bi, sci, p: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, rep, 1), lambda bi, sci, p: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hr, 1), jnp.float32),   # running max
                pltpu.VMEM((hr, 1), jnp.float32),   # running denom
                pltpu.VMEM((hr, d), jnp.float32),   # running context
            ],
        ),
        interpret=interpret,
    )


def decode_attention_state(
    q: Array,          # [B, Hkv, rep, D] bf16/f32
    k_codes: Array,    # [B, Hkv, S, D] int8 / [B, Hkv, S, D/2] uint8 (kv4);
                       # or the STACKED cache [L, B, Hkv, S, cd] with `layer`
    k_scale: Array,    # [B, Hkv, S, 1] f32 (or stacked [L, B, Hkv, S, 1])
    v_codes: Array,
    v_scale: Array,
    positions: Array,  # [B] int32 — current decode position per row;
                       # cache positions p < positions[b] contribute
    sm_scale: float,
    *,
    layer: Optional[int] = None,   # REQUIRED with stacked (5-D) codes:
                                   # the kernel block-indexes the layer so
                                   # no per-layer cache copy materializes
    starts: Optional[Array] = None,  # [B] int32 — first attended cache
                                   # index (inclusive).  Sliding window:
                                   # max(0, pos - w + 1); Llama-4 chunk:
                                   # (pos // C) * C.  None = 0 (full
                                   # strict-causal prefix).
    interpret: bool = False,
) -> Optional[Tuple[Array, Array, Array]]:
    """Returns (acc [B,Hkv,rep,D] f32, m [B,Hkv,rep,1], l [B,Hkv,rep,1])
    — the unnormalized flash state over the LIVE cache window
    [starts[b], positions[b]) — or None when the geometry has no fast
    path.  ctx = acc / l when no extra terms join the softmax."""
    b, hkv, rep, d = q.shape
    stacked = k_codes.ndim == 5
    if stacked and layer is None:
        raise ValueError("stacked cache codes need layer=")
    s = k_codes.shape[3 if stacked else 2]
    kv_bits = 4 if k_codes.dtype == jnp.uint8 else 8
    cd = k_codes.shape[-1]
    if d % 128 or (kv_bits == 4 and cd != d // 2) or (kv_bits == 8 and cd != d):
        return None
    sc = min(S_CHUNK, s)
    if s % sc:
        return None
    if stacked:
        ks2 = k_scale[layer].reshape(b, hkv, 1, s)   # small (S f32) copies
        vs2 = v_scale[layer].reshape(b, hkv, 1, s)
    else:
        ks2 = k_scale.reshape(b, hkv, 1, s)
        vs2 = v_scale.reshape(b, hkv, 1, s)
    kf = _kernel(b, hkv, rep, s, d, sc, kv_bits, sm_scale,
                 layer if stacked else -1, interpret)
    pos32 = positions.astype(jnp.int32)
    st32 = (jnp.zeros_like(pos32) if starts is None
            else starts.astype(jnp.int32))
    return kf(jnp.stack([pos32, st32]), q.astype(jnp.bfloat16),
              k_codes, ks2, v_codes, vs2)
