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


# ---------------------------------------------------------------------------
# ZeRO-sharded optimizer (stage 1/2)
# ---------------------------------------------------------------------------

_ZERO_PAD = 1024  # per-leaf flat pad quantum: dp * lane tile, and a multiple
                  # of opt8's 256-element blocks so blockwise moment state
                  # slices cleanly along the shard boundary


def _zero_flatten(leaf: Array, dp: int) -> Array:
    flat = leaf.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % (dp * _ZERO_PAD)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat


def _zero_state_spec(state, dp: int, dp_axis: str):
    """Sharding spec for an optimizer-state pytree built over flat padded
    params: 1-D dp-divisible leaves shard over dp (moments, blockwise
    scales), everything else (step counts) replicates.  Covers every
    ELEMENTWISE optax transform — adam/adamw/sgd/piquant_tpu.quant.opt8 —
    whose state leaves are parallel to the (flat) params or scalar."""
    def spec(a):
        if (hasattr(a, "ndim") and a.ndim == 1 and a.size
                and a.size % dp == 0):
            return P(dp_axis)
        return P()
    return jax.tree.map(spec, state)


def make_zero_train_step(
    loss_fn: Callable[[Any, Any], Array],
    optimizer,                               # ELEMENTWISE optax transform
    mesh,
    dp_axis: str = "dp",
    grad_wire: Optional[str] = "uint8",      # None = exact f32 psum_scatter
    round_mode: str = "stochastic",
    param_wire: Optional[str] = None,        # quantize the param all-gather
                                             # (replicas become q(master);
                                             # masters stay exact f32)
) -> Tuple[Callable, Callable]:
    """ZeRO-1/2: optimizer state and gradient reduction sharded over
    `dp_axis` (Rajbhandari et al., 2019), on the quantized ring wire.

    Per leaf (flattened + padded): gradients ride ONE quantized
    reduce-scatter (bits/32 of the f32 all-reduce traffic — the
    dequantize-ADD ring the reference built its ADD store op for,
    include/piquant.hpp:28-33); each device applies the optimizer to its
    1/dp shard of (params, moments); updated shards return via ring
    all-gather.  Optimizer state lives ONLY as shards: with
    quant/opt8.adam8bit that is 2.06/dp bytes per parameter — 0.26
    B/param on a dp=8 pod slice vs 8 for replicated f32 Adam.

    Scope: dp-axis sharding of replicated params (the FSDP-on-dp
    case).  Stage-3 (param sharding) on TPU is GSPMD's job: annotate the
    param pytree with `jax.sharding` and pjit materializes gather/compute
    overlap — no manual schedule beats the compiler there.

    Returns `(init_fn, step_fn)`:
        state = init_fn(params)
        params, state, loss = step_fn(params, state, batch, key)

    The optimizer must be elementwise (its state leaves parallel to the
    flat params, plus scalars) — cross-leaf couplings like
    clip_by_global_norm would see per-shard norms.
    """
    import optax
    from jax.sharding import NamedSharding

    from piquant_tpu.parallel.collectives import (
        quantized_all_gather,
        quantized_reduce_scatter,
    )

    dp = mesh.shape[dp_axis]

    def init_fn(params):
        flat = jax.tree.map(lambda l: _zero_flatten(l, dp), params)
        shapes = jax.eval_shape(optimizer.init, flat)
        spec = _zero_state_spec(shapes, dp, dp_axis)
        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
        # jit-with-out-shardings: moments materialize directly as shards —
        # the full-size state never exists unsharded on any one device
        return jax.jit(optimizer.init, out_shardings=shardings)(flat)

    def step_fn(params, state, batch, key=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)

        leaves, treedef = jax.tree.flatten(params)
        gleaves = jax.tree.leaves(grads)
        pflat = [_zero_flatten(l, dp) for l in leaves]
        gflat = [_zero_flatten(g, dp) for g in gleaves]
        use_keys = key is not None
        kflat = (list(jax.random.split(key, len(pflat))) if use_keys
                 else None)

        state_spec = _zero_state_spec(state, dp, dp_axis)

        def body(pfs, gfs, st, ks):
            d = jax.lax.axis_index(dp_axis)
            keys = ks if ks is not None else [None] * len(gfs)
            shards = []
            for g, k in zip(gfs, keys):
                if grad_wire is None:
                    shards.append(jax.lax.psum_scatter(
                        g, dp_axis, scatter_dimension=0, tiled=True) / dp)
                else:
                    shards.append(quantized_reduce_scatter(
                        g, dp_axis, grad_wire, round_mode, key=k) / dp)
            # quantized RS leaves device d holding chunk (d+1) mod dp;
            # exact psum_scatter delivers chunk d
            own = d if grad_wire is None else (d + 1) % dp
            s_of = [g.size // dp for g in gfs]
            pshards = [jax.lax.dynamic_slice(p, (own * s,), (s,))
                       for p, s in zip(pfs, s_of)]
            gtree = jax.tree.unflatten(treedef, shards)
            ptree = jax.tree.unflatten(treedef, pshards)
            upd, st2 = optimizer.update(gtree, st, ptree)
            new_shards = jax.tree.leaves(optax.apply_updates(ptree, upd))

            def gather(x, k):
                if param_wire is None:
                    full = jax.lax.all_gather(x, dp_axis, tiled=False)
                else:
                    full = quantized_all_gather(
                        x, dp_axis, param_wire, "nearest", key=k
                    ).reshape(dp, -1)
                if grad_wire is not None:   # undo the +1 ring rotation
                    full = jnp.roll(full, 1, axis=0)
                return full.reshape(-1)

            return [gather(x, k) for x, k in zip(new_shards, keys)], st2

        if use_keys:
            pfs2, state2 = shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), state_spec, P()),
                out_specs=(P(), state_spec),
                check_vma=False,
            )(pflat, gflat, state, kflat)
        else:
            pfs2, state2 = shard_map(
                lambda a, b, c: body(a, b, c, None), mesh=mesh,
                in_specs=(P(), P(), state_spec),
                out_specs=(P(), state_spec),
                check_vma=False,
            )(pflat, gflat, state)

        new_leaves = [f[: l.size].reshape(l.shape).astype(l.dtype)
                      for f, l in zip(pfs2, leaves)]
        return jax.tree.unflatten(treedef, new_leaves), state2, loss

    return init_fn, step_fn
