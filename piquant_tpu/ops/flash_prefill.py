"""Flash-attention prefill: O(T) memory instead of materialized scores.

The XLA prefill path materializes [B, H, T, S] f32 scores per layer
(llama._attention's einsum -> softmax -> einsum).  At 8x1024 that is
~1 GB of HBM round-trips per layer and caps single-chip prefill at
B*ctx ~ 8k (the attention temporaries exceed HBM beyond that —
benchmarks/decode_8b.py).  The tiled flash kernel (running-max online
softmax over K blocks) never materializes the scores, so prefill memory
goes O(T^2) -> O(T) and long contexts fit on one chip.

Two kernels behind one dispatcher:

  * the NATIVE masked kernel (ops/pallas/flash.py): GQA without the
    K/V head repeat, sliding window, chunked attention, logit softcap,
    attention sinks — covers every mask family llama.build_mask emits
    (Mistral, Gemma-2/3, GPT-OSS, Llama-4 included);
  * the Mosaic flash kernel shipped with JAX
    (jax.experimental.pallas.ops.tpu.flash_attention) for the plain
    causal geometry, where its per-generation block tuning applies.
    GQA there is handled by repeating K/V to the full head count.

PIQUANT_FLASH=0 disables; =force engages off-TPU (interpret mode for
the native kernel — tests run it that way).  PIQUANT_FLASH_IMPL=native
routes plain causal through the native kernel too (A/B benchmarking);
=jax forbids the native kernel (vanilla only, windowed falls back).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def flash_prefill(q: Array, k: Array, v: Array, sm_scale: float, *,
                  pos0: Optional[Array] = None,
                  window: Optional[int] = None,
                  chunk: Optional[int] = None,
                  softcap: Optional[float] = None,
                  sinks: Optional[Array] = None,
                  ) -> Optional[Array]:
    """q: [B, Hkv, rep, T, D]; k/v: [B, Hkv, T, D] (bf16/f32).

    Returns [B, Hkv, rep, T, D] f32 context, or None when the geometry
    or backend can't take a kernel (caller materializes scores).
    """
    env = os.environ.get("PIQUANT_FLASH", "1")
    if env == "0":
        return None
    b, hkv, rep, t, d = q.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and env != "force":
        return None
    impl = os.environ.get("PIQUANT_FLASH_IMPL", "jax")
    extras = (window is not None or chunk is not None
              or softcap is not None or sinks is not None)

    if not extras and impl != "native":
        ctx = _jax_causal(q, k, v, sm_scale)
        if ctx is not None:
            return ctx
        if impl == "jax":
            return None

    from piquant_tpu.ops.pallas.flash import flash_prefill_masked

    return flash_prefill_masked(q, k, v, sm_scale, pos0=pos0,
                                window=window, chunk=chunk,
                                softcap=softcap, sinks=sinks,
                                interpret=not on_tpu)


def _jax_causal(q: Array, k: Array, v: Array,
                sm_scale: float) -> Optional[Array]:
    if jax.config.jax_enable_x64:
        # the shipped kernel mixes int32/int64 index math under x64
        # (flash_attention.py:626 lax.select) — fall back; production TPU
        # runs x64 off, tests wrap calls in jax.experimental.disable_x64()
        return None
    b, hkv, rep, t, d = q.shape
    if d != 128 or t % 128 or t < 256:
        return None
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    blk = next((c for c in (512, 256, 128) if t % c == 0), None)
    if blk is None:
        return None
    h = hkv * rep
    qf = q.reshape(b, h, t, d).astype(jnp.bfloat16)
    kf = jnp.repeat(k, rep, axis=1).astype(jnp.bfloat16)
    vf = jnp.repeat(v, rep, axis=1).astype(jnp.bfloat16)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        # (only the forward pass is used at prefill; backward blocks are
        # required constructor args)
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    ctx = flash_attention(qf, kf, vf, causal=True, sm_scale=sm_scale,
                          block_sizes=bs)
    return ctx.astype(jnp.float32).reshape(b, hkv, rep, t, d)
