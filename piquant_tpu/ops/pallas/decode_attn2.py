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
  * kv4 unpack IN-REGISTER: the PAIR-PACKED cache (quant/kv_cache.py
    pack4_pairs — storage row t = [pack4(pos 2t) | pack4(pos 2t+1)],
    full 128-lane rows) streams at D/2 bytes per position and expands to
    even/odd-position bf16 planes inside VMEM.  Scores for the two
    parity planes are computed as two half-width MXU dots and
    lane-concatenated; the mask/scale column bookkeeping runs in the
    [even-half | odd-half] layout.  (The earlier [.., S, D/2] layout hit
    Mosaic's 128-lane block alignment on the stacked cache and kv4 was
    stuck on the XLA unpack path.)
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


def _s_chunk() -> int:
    """Cache-chunk rows per grid step (trace-time env override for
    sweeps: the per-step K/V block is hkv*sc*d int8 bytes — sc trades
    live-length granularity against DMA block size)."""
    import os
    try:
        v = int(os.environ.get("PIQUANT_ATTN2_SC", "0"))
    except ValueError:
        v = 0
    return v if v >= 128 else S_CHUNK


@lru_cache(maxsize=None)
def _kernel(b: int, hkv: int, rep: int, s: int, d: int, sc: int,
            kv_bits: int, scale: float, layer: int = -1,
            interpret: bool = False):
    """layer >= 0: code operands are the STACKED cache [L, B, Hkv, Sr, D]
    and blocks select (layer, bi, ...) — XLA cannot fuse a slice into a
    custom call, so per-layer sliced operands cost a full cache copy per
    layer per step (measured +3 ms on 8B decode); stacked blocks read the
    cache buffer in place.

    kv4: code rows are pair-packed (Sr = s/2 rows of D bytes; see module
    docstring) and scales parity-split [B, Hkv, 2, s/2]."""
    nsc = s // sc
    hr = hkv * rep
    hd2 = d // 2
    sch = sc // 2            # kv4: packed rows per chunk
    half = hkv * sch         # kv4: score columns per parity plane

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

        def unpack_planes(codes):
            """Pair-packed (hkv*sch, d) uint8 rows -> (even, odd) bf16
            RAW-NIBBLE planes in [1, 15], each (hkv*sch, d): lanes
            [0, d/2) hold the even position's pack4 bytes, [d/2, d) the
            odd's; each pack4 byte j holds code j (low nibble) and code
            j + d/2 (high).  The stored offset (-8) is NOT applied here —
            it folds analytically into rank-1 corrections on the dots
            (x @ (nib - 8) = x @ nib - 8 * rowsum(x)), saving two
            full-plane VPU subtract passes per operand."""
            p = codes.astype(jnp.int32)
            plo, phi = p[:, :hd2], p[:, hd2:]
            even = jnp.concatenate([plo & 15, plo >> 4], axis=-1)
            odd = jnp.concatenate([phi & 15, phi >> 4], axis=-1)
            return even.astype(jnp.bfloat16), odd.astype(jnp.bfloat16)

        # live window in this chunk?  (start <= idx < pos overlaps
        # [s0, s0 + sc))
        @pl.when((s0 < pos) & (s0 + sc > start))
        def _():
            q_all = q_ref[0].reshape(hr, d)                  # (hr, d) bf16

            if kv_bits == 8:
                kb = kc_ref[0].reshape(hkv * sc, d
                                       ).astype(jnp.int32).astype(jnp.bfloat16)
                scores = jax.lax.dot_general(
                    q_all, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (hr, hkv*sc)
                # per-(head, position) K scales, one lane-concat row vector
                ks_row = jnp.concatenate(
                    [ks_ref[0, h] for h in range(hkv)], axis=-1)  # (1, hkv*sc)
                sc32, rep32 = jnp.int32(sc), jnp.int32(rep)  # x64-safe
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (hr, hkv * sc), 1)
                head = col // sc32
                idx = jax.lax.rem(col, sc32) + jnp.int32(s0)
            else:
                ke, ko = unpack_planes(kc_ref[0].reshape(hkv * sch, d))
                se = jax.lax.dot_general(
                    q_all, ke, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (hr, half)
                so = jax.lax.dot_general(
                    q_all, ko, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # raw nibbles: q . (nib - 8) = q . nib - 8 * sum_d(q)
                qsum = jnp.sum(q_all.astype(jnp.float32), axis=1,
                               keepdims=True)                # (hr, 1)
                scores = jnp.concatenate([se, so], axis=1) - 8.0 * qsum
                # column c: parity plane c // half, head (c % half) // sch,
                # in-chunk pair row (c % half) % sch
                ks_row = jnp.concatenate(
                    [ks_ref[0, h, 0:1] for h in range(hkv)]
                    + [ks_ref[0, h, 1:2] for h in range(hkv)],
                    axis=-1)                                  # (1, 2*half)
                h32, sch32 = jnp.int32(half), jnp.int32(sch)
                rep32 = jnp.int32(rep)
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (hr, 2 * half), 1)
                parity = col // h32
                within = jax.lax.rem(col, h32)
                head = within // sch32
                idx = (jax.lax.rem(within, sch32) * 2 + parity
                       + jnp.int32(s0))

            scores = scores * (ks_row * scale)

            # valid = window (start <= idx < pos) AND same-head block
            row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
            ok = (idx >= start) & (idx < pos) & (head == row // rep32)
            scores = jnp.where(ok, scores, NEG_INF)

            m_old = m_ref[:]                                  # (hr, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
            p = jnp.exp(scores - m_new)                       # (hr, cols)
            corr = jnp.exp(m_old - m_new)
            l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new

            if kv_bits == 8:
                vs_row = jnp.concatenate(
                    [vs_ref[0, h] for h in range(hkv)], axis=-1)  # (1, hkv*sc)
                pv = (p * vs_row).astype(jnp.bfloat16)
                vb = vc_ref[0].reshape(hkv * sc, d
                                       ).astype(jnp.int32).astype(jnp.bfloat16)
                upd = jax.lax.dot_general(
                    pv, vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (hr, d)
            else:
                vs_row = jnp.concatenate(
                    [vs_ref[0, h, 0:1] for h in range(hkv)]
                    + [vs_ref[0, h, 1:2] for h in range(hkv)],
                    axis=-1)                                  # (1, 2*half)
                pv = (p * vs_row).astype(jnp.bfloat16)
                ve, vo = unpack_planes(vc_ref[0].reshape(hkv * sch, d))
                upd = jax.lax.dot_general(
                    pv[:, :half], ve, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                upd += jax.lax.dot_general(
                    pv[:, half:], vo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # raw nibbles: pv . (nib - 8) = pv . nib - 8 * rowsum(pv)
                upd -= 8.0 * jnp.sum(pv.astype(jnp.float32), axis=1,
                                     keepdims=True)          # (hr, 1) bcast
            acc_ref[:] = acc_ref[:] * corr + upd

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

    # kv4 code blocks cover sch pair-packed rows per chunk (the block
    # index units are rows of the packed axis, which the chunk index
    # already matches: chunk sci = packed rows [sci*sch, (sci+1)*sch))
    rows = sch if kv_bits == 4 else sc
    if layer >= 0:
        def kv_map(bi, sci, p):
            return (layer, bi, 0, live_chunk(bi, sci, p), 0)
        kv_block = (1, 1, hkv, rows, d)
    else:
        def kv_map(bi, sci, p):
            return (bi, 0, live_chunk(bi, sci, p), 0)
        kv_block = (1, hkv, rows, d)

    def sc_map(bi, sci, p):
        return (bi, 0, 0, live_chunk(bi, sci, p))

    sc_block = ((1, hkv, 2, sch) if kv_bits == 4 else (1, hkv, 1, sc))

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
                pl.BlockSpec(sc_block, sc_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(kv_block, kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(sc_block, sc_map,
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
    k_codes: Array,    # [B, Hkv, S, D] int8, or [B, Hkv, S/2, D] uint8
                       # pair-packed kv4; or the STACKED cache
                       # [L, B, Hkv, Sr, D] with `layer`
    k_scale: Array,    # [B, Hkv, S, 1] f32, kv4 [B, Hkv, 2, S/2]
                       # (stacked: one more leading L axis)
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
    kv_bits = 4 if k_codes.dtype == jnp.uint8 else 8
    rows = k_codes.shape[3 if stacked else 2]
    s = rows * 2 if kv_bits == 4 else rows
    cd = k_codes.shape[-1]
    if d % 128 or cd != d:
        return None
    sc = min(_s_chunk(), s)
    if s % sc:
        return None
    if kv_bits == 4:
        # the parity-split scale block's last dim is sc/2 — Mosaic wants
        # 128-lane alignment when compiled (interpret mode is exempt)
        if sc % 2 or (not interpret and (sc // 2) % 128):
            return None
        ks2 = k_scale[layer] if stacked else k_scale   # [B, Hkv, 2, S/2]
        vs2 = v_scale[layer] if stacked else v_scale
        # reject the pre-refactor [B,Hkv,S,1] layout (and any other shape)
        # here rather than deep inside pallas_call's BlockSpec check
        if ks2.shape[-2:] != (2, s // 2) or vs2.shape[-2:] != (2, s // 2):
            return None
    elif stacked:
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
