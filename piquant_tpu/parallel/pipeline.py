"""Pipeline parallelism (GPipe-style) over a `pp` mesh axis.

TPU-native formulation: every stage runs the SAME program under shard_map
(SPMD — there is no per-stage code on TPU), holding its own stage's
parameters (pytree leaves stacked on a leading [P] axis, sharded over
`pp`).  Microbatches flow stage -> stage through `lax.ppermute` ring hops;
the classic (P + M - 1)-tick schedule with bubble ticks computing into
dead registers.

The reference (pi-quant) has no model parallelism of any kind (SURVEY
§2.3); this module exists to make the parallelism matrix complete for the
serving/training stack built around the quantized kernels.  Quantized
activations on the wire compose naturally: pass `wire_quant="uint8"` and
each hop moves int8 codes + scale instead of bf16 (the same
quantize -> ppermute -> dequantize scheme as parallel/collectives.py).

Usage (inside shard_map over a mesh with a "pp" axis):

    y = pipeline_apply(stage_fn, stage_params, x, n_microbatches=M,
                       axis_name="pp")

where `stage_fn(params_slice, x_mb) -> y_mb` is one stage's computation and
`stage_params` leaves are the LOCAL stage's slice (shard_map already sliced
the stacked [P, ...] pytree).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def stack_stage_params(per_stage: list) -> Any:
    """[stage0_pytree, stage1_pytree, ...] -> one pytree with leading [P]
    axis per leaf (shard this axis over the `pp` mesh dimension)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def _ring_perm(p: int):
    return [(s, (s + 1) % p) for s in range(p)]


def pipeline_apply(
    stage_fn: Callable[[Any, Array], Array],
    stage_params: Any,
    x: Array,                 # [M, mb, ...] microbatched input (replicated)
    axis_name: str = "pp",
    *,
    wire_quant: Optional[str] = None,  # "uint8": quantize activations per hop
) -> Array:
    """Run x's M microbatches through all P stages; returns [M, mb, ...]
    outputs (replicated to every stage via a final psum).

    Must be called INSIDE shard_map with `stage_params` sharded over
    `axis_name` on the leading stacked-stage axis (in_spec P("pp", ...)):
    each device's slice arrives as [1, ...] and the leading axis is
    squeezed here.  `x` is replicated.  Bubble ticks run stage_fn on
    garbage registers and discard the result — the standard GPipe trade
    (utilization M / (M + P - 1))."""
    stage_params = jax.tree.map(lambda a: jnp.squeeze(a, 0), stage_params)
    p = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    m = x.shape[0]
    ticks = m + p - 1

    # registers: recv (activation arriving from the previous stage) and the
    # output accumulator (valid only on the last stage until the psum)
    mb_shape = x.shape[1:]
    probe = jax.eval_shape(stage_fn, stage_params, jax.ShapeDtypeStruct(
        mb_shape, x.dtype))
    if probe.shape != mb_shape:
        raise ValueError(
            f"pipeline stages must preserve the microbatch shape "
            f"(got {probe.shape} != {mb_shape}) — pad or project inside the "
            f"stage")

    def quantize_hop(h):
        if wire_quant is None:
            return h
        amax = jnp.max(jnp.abs(h.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-8) / 127.0
        codes = jnp.clip(jnp.round(h.astype(jnp.float32) / scale),
                         -127, 127).astype(jnp.int8)
        return codes, scale

    def dequantize_hop(w, dtype):
        if wire_quant is None:
            return w
        codes, scale = w
        return (codes.astype(jnp.float32) * scale).astype(dtype)

    def permute_hop(w):
        if wire_quant is None:
            return jax.lax.ppermute(w, axis_name, _ring_perm(p))
        codes, scale = w
        return (jax.lax.ppermute(codes, axis_name, _ring_perm(p)),
                jax.lax.ppermute(scale, axis_name, _ring_perm(p)))

    def tick(t, carry):
        recv, ys = carry
        mb = t - stage                       # microbatch this stage works on
        valid = (mb >= 0) & (mb < m)
        mb_c = jnp.clip(mb, 0, m - 1)
        x_mb = jax.lax.dynamic_index_in_dim(x, mb_c, keepdims=False)
        inp = jnp.where(stage == 0, x_mb, recv)
        h = stage_fn(stage_params, inp)      # bubble ticks compute garbage
        write = valid & (stage == p - 1)
        ys = jax.lax.dynamic_update_index_in_dim(
            ys,
            jnp.where(write, h, jax.lax.dynamic_index_in_dim(
                ys, mb_c, keepdims=False)),
            mb_c, 0)
        recv = dequantize_hop(permute_hop(quantize_hop(h)), x.dtype)
        return recv, ys

    recv0 = jnp.zeros(mb_shape, x.dtype)
    ys0 = jnp.zeros((m,) + mb_shape, x.dtype)
    # mark the carry as varying over the pp axis (shard_map's typed manual
    # axes: the loop body produces pp-varying values)
    if hasattr(jax.lax, "pcast"):
        recv0 = jax.lax.pcast(recv0, (axis_name,), to="varying")
        ys0 = jax.lax.pcast(ys0, (axis_name,), to="varying")
    elif hasattr(jax.lax, "pvary"):
        recv0 = jax.lax.pvary(recv0, (axis_name,))
        ys0 = jax.lax.pvary(ys0, (axis_name,))
    _, ys = jax.lax.fori_loop(0, ticks, tick, (recv0, ys0))

    # replicate the last stage's outputs to every device
    return jax.lax.psum(jnp.where(stage == p - 1, ys, jnp.zeros_like(ys)),
                        axis_name)
