"""Fused INT8-KV decode attention (flash-decoding style).

One grid cell processes one batch row x one S-chunk for ALL kv heads:
the int8 K/V code blocks stream HBM->VMEM once, dequantize in-register
(per-token scales fold into scores/probabilities), and an online-softmax
running (max, denom, acc) in VMEM scratch carries across the sequential
S-chunk grid dimension.  The bf16 cache is never materialized — the
traffic is exactly the packed codes.

Decode only (T=1).  Longer queries (prefill) use the XLA path in
models/llama.py, which is compute-bound anyway.
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
def _decode_attn_kernel(b: int, hkv: int, rep: int, s: int, d: int,
                        sc: int, scale: float):
    nsc = s // sc

    def kern(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref, o_ref,
             m_ref, l_ref, acc_ref):
        bi = pl.program_id(0)
        sci = pl.program_id(1)

        @pl.when(sci == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        pos = pos_ref[bi]
        s0 = sci * sc
        # global kv indices of this chunk; valid = attend to idx <= pos
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, sc), 1) + s0
        valid = (idx <= pos)  # (1, sc)

        @pl.when(s0 <= pos)  # skip compute for fully-masked chunks
        def _():
            for h in range(hkv):
                q = q_ref[0, h]                    # (rep, d) bf16
                # int8 -> bf16 via int32 (Mosaic lacks some direct 8-bit casts)
                kc = kc_ref[0, h].astype(jnp.int32).astype(jnp.bfloat16)  # (sc, d)
                ks = ks_ref[0, h, :, 0]            # (sc,) f32
                scores = jax.lax.dot_general(
                    q, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (rep, sc)
                scores = scores * (ks * scale)[None, :]
                scores = jnp.where(valid, scores, NEG_INF)

                m_old = m_ref[h]                   # (rep, 1)
                m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
                p = jnp.exp(scores - m_new)        # (rep, sc)
                corr = jnp.exp(m_old - m_new)      # (rep, 1)
                l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=1, keepdims=True)
                m_ref[h] = m_new

                vs = vs_ref[0, h, :, 0]            # (sc,)
                pv = (p * vs[None, :]).astype(jnp.bfloat16)
                vc = vc_ref[0, h].astype(jnp.int32).astype(jnp.bfloat16)  # (sc, d)
                acc_ref[h] = acc_ref[h] * corr + jnp.dot(
                    pv, vc, preferred_element_type=jnp.float32)

        @pl.when(sci == nsc - 1)
        def _():
            for h in range(hkv):
                o_ref[0, h] = acc_ref[h] / l_ref[h]

    grid = (b, nsc)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as the LAST argument
                pl.BlockSpec((1, hkv, rep, d), lambda bi, sci, p: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, sc, d), lambda bi, sci, p: (bi, 0, sci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, sc, 1), lambda bi, sci, p: (bi, 0, sci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, sc, d), lambda bi, sci, p: (bi, 0, sci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, sc, 1), lambda bi, sci, p: (bi, 0, sci, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hkv, rep, d),
                                   lambda bi, sci, p: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hkv, rep, 1), jnp.float32),  # running max
                pltpu.VMEM((hkv, rep, 1), jnp.float32),  # running denom
                pltpu.VMEM((hkv, rep, d), jnp.float32),  # running context
            ],
        ),
    )


def decode_attention(
    q: Array,          # [B, Hkv, rep, D] bf16/f32
    k_codes: Array,    # [B, Hkv, S, D] int8
    k_scale: Array,    # [B, Hkv, S, 1] f32
    v_codes: Array,
    v_scale: Array,
    positions: Array,  # [B] int32 — current decode position per row
    sm_scale: float,
) -> Optional[Array]:
    """Returns ctx [B, Hkv, rep, D] f32, or None if no fast path."""
    b, hkv, rep, d = q.shape
    s = k_codes.shape[2]
    if d % 128 or s % 8:
        return None
    sc = min(S_CHUNK, s)
    if s % sc:
        return None
    k = _decode_attn_kernel(b, hkv, rep, s, d, sc, sm_scale)
    return k(positions.astype(jnp.int32), q.astype(jnp.bfloat16),
             k_codes, k_scale, v_codes, v_scale)
