"""Grouped (megablocks-style) MoE routing for the ragged quantized GEMM.

The dense MoE path (models/llama._mlp_moe) evaluates EVERY expert on EVERY
token and masks — an E/top_k FLOP waste at prefill (4x on Mixtral).  This
module builds the static-shape routing that lets a Pallas ragged GEMM
(ops/pallas/qmatmul.w4_ragged_matmul) compute only the assigned
(token, expert) pairs:

  * the A = n_tokens * top_k assignments are sorted by expert (stable
    argsort — static shape, data-dependent VALUES only),
  * each expert's run is padded to a whole `bm`-row block, so every kernel
    block belongs to exactly one expert,
  * the block -> expert map rides the kernel's scalar-prefetch channel.

Everything is jit-static: the padded row count M = ceil((A + E*(bm-1))/bm)*bm
is a compile-time constant; only array VALUES depend on the routing.
Cf. MegaBlocks (PAPERS.md) — here re-derived for TPU Pallas with packed
INT4 expert weights (no dropped tokens, no capacity factor).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RaggedRouting(NamedTuple):
    dest: Array          # [A] row of each sorted assignment in the padded buffer
    token_idx: Array     # [A] source token of each sorted assignment
    gate: Array          # [A] routing weight of each sorted assignment
    block_expert: Array  # [M // bm] expert id of each row block
    m_pad: int           # padded row count (static)


def build_ragged_routing(topi: Array, probs: Array, n_experts: int,
                         bm: int) -> RaggedRouting:
    """topi/probs [..., top_k] -> sorted/padded assignment routing."""
    flat_e = topi.reshape(-1).astype(jnp.int32)
    a = flat_e.size
    k = topi.shape[-1]
    e = n_experts

    order = jnp.argsort(flat_e, stable=True)
    sorted_e = flat_e[order]
    counts = jnp.sum(flat_e[None, :] == jnp.arange(e, dtype=jnp.int32)[:, None],
                     axis=1).astype(jnp.int32)
    padded = (counts + bm - 1) // bm * bm
    p_end = jnp.cumsum(padded)
    p_off = p_end - padded                       # start row of each expert
    s_off = jnp.cumsum(counts) - counts
    rank = jnp.arange(a, dtype=jnp.int32) - s_off[sorted_e]
    dest = p_off[sorted_e] + rank

    m_pad = ((a + e * (bm - 1)) + bm - 1) // bm * bm
    starts = jnp.arange(m_pad // bm, dtype=jnp.int32) * bm
    block_expert = jnp.minimum(
        jnp.searchsorted(p_end, starts, side="right").astype(jnp.int32),
        e - 1)

    return RaggedRouting(
        dest=dest,
        token_idx=order // k,
        gate=probs.reshape(-1)[order],
        block_expert=block_expert,
        m_pad=m_pad,
    )


def scatter_tokens(x_flat: Array, r: RaggedRouting) -> Array:
    """Token activations [N_tok, D] -> padded sorted buffer [M, D]
    (padding rows stay zero; their GEMM outputs are never gathered)."""
    out = jnp.zeros((r.m_pad, x_flat.shape[-1]), x_flat.dtype)
    return out.at[r.dest].set(x_flat[r.token_idx])


def combine_tokens(y_sorted: Array, r: RaggedRouting, n_tokens: int) -> Array:
    """Padded sorted outputs [M, D] -> gate-weighted per-token sum
    [N_tok, D] (float32 accumulation)."""
    rows = y_sorted[r.dest].astype(jnp.float32) * r.gate[:, None].astype(jnp.float32)
    out = jnp.zeros((n_tokens, y_sorted.shape[-1]), jnp.float32)
    return out.at[r.token_idx].add(rows)
