"""Fused INT8-KV decode attention (flash-decoding style).

One grid cell processes one batch row x one S-chunk for ALL kv heads:
the int8 K/V code blocks stream HBM->VMEM once, dequantize in-register
(per-token scales fold into scores/probabilities), and an online-softmax
running (max, denom, acc) in VMEM scratch carries across the sequential
S-chunk grid dimension.  The bf16 cache is never materialized — the
traffic is exactly the packed codes.

Decode only (T=1).  NOT wired into models/llama.py: the fused XLA
int8-cache attention measured 33 us/layer (~1 TB/s effective — at the HBM
wall) vs 228 us/layer for this kernel on 8B decode shapes, so the model
keeps the XLA path.  The kernel stays as a reference implementation of
scalar-prefetch flash-decoding (and the starting point for a paged variant
should one ever be needed).
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
            # batched over kv heads in ONE dot_general per phase (a Python
            # per-head loop measured ~1.5x slower)
            qb = q_ref[0]                                        # (hkv, rep, d)
            # int8 -> bf16 via int32 (Mosaic lacks some direct 8-bit casts)
            kb = kc_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (hkv, sc, d)
            scores = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)              # (hkv, rep, sc)
            ksb = ks_ref[0, :, :, 0]                             # (hkv, sc)
            scores = scores * (ksb[:, None, :] * scale)
            scores = jnp.where(valid[None], scores, NEG_INF)

            m_old = m_ref[:]                                     # (hkv, rep, 1)
            m_new = jnp.maximum(m_old, jnp.max(scores, axis=2, keepdims=True))
            p = jnp.exp(scores - m_new)
            corr = jnp.exp(m_old - m_new)
            l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=2, keepdims=True)
            m_ref[:] = m_new

            vsb = vs_ref[0, :, :, 0]                             # (hkv, sc)
            pv = (p * vsb[:, None, :]).astype(jnp.bfloat16)
            vb = vc_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
            acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
                pv, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        @pl.when(sci == nsc - 1)
        def _():
            o_ref[0] = acc_ref[:] / l_ref[:]

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
