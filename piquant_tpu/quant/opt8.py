"""8-bit Adam: blockwise-INT8 optimizer states (bitsandbytes-style).

Adam keeps two f32 moments per parameter — 8 bytes/param, often more
HBM than the (quantized) weights themselves.  This optimizer stores
both moments as blockwise INT8 codes + one f32 scale per block
(`block=128` → 2.06 bytes/param, a 3.9× state-memory cut), built on
the same symmetric per-block quantizer as the INT8 KV cache.

Quantization scheme per 128-element block:
  * first moment m: symmetric int8 (signed, absmax/127) — exactly the
    KV-cache recipe;
  * second moment v: stored as sqrt(v) in uint8 (max/255).  sqrt
    halves the dynamic range in log scale, which is what makes a
    LINEAR 8-bit grid workable where raw v (spanning decades within a
    block) is not — the simple alternative to bitsandbytes' dynamic
    tree datatype.  The denominator sqrt(v)+eps is then first-order
    accurate in the stored quantity itself.

The moments are dequantized, updated in f32, and requantized every
step (a fused elementwise chain XLA keeps on-chip); the parameter
update math is bias-corrected Adam, bit-for-bit the optax formulation
apart from the state storage.

Usage (drop-in for optax.adam):

    import optax
    from piquant_tpu.quant.opt8 import adam8bit
    opt = adam8bit(3e-4)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, updates)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array

_BLOCK = 128


class _QMoment(NamedTuple):
    codes: Array   # int8 / uint8, [n_pad] flat
    scale: Array   # f32, [n_pad // block]


class Adam8State(NamedTuple):
    count: Array
    m: object      # pytree of _QMoment (signed)
    v: object      # pytree of _QMoment (unsigned, stores sqrt(v))


def _pad_len(n: int, block: int) -> int:
    return (n + block - 1) // block * block


def _q_signed(x: Array, block: int) -> _QMoment:
    xf = x.reshape(-1, block)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return _QMoment(codes.reshape(-1), scale[:, 0])


def _dq_signed(q: _QMoment, block: int) -> Array:
    return (q.codes.reshape(-1, block).astype(jnp.float32)
            * q.scale[:, None]).reshape(-1)


def _q_unsigned(x: Array, block: int) -> _QMoment:
    xf = x.reshape(-1, block)
    amax = jnp.max(xf, axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 255.0
    codes = jnp.clip(jnp.round(xf / scale), 0, 255).astype(jnp.uint8)
    return _QMoment(codes.reshape(-1), scale[:, 0])


def _dq_unsigned(q: _QMoment, block: int) -> Array:
    return (q.codes.reshape(-1, block).astype(jnp.float32)
            * q.scale[:, None]).reshape(-1)


def scale_by_adam8(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                   block: int = _BLOCK) -> optax.GradientTransformation:
    """Adam moment tracking with blockwise-INT8 state storage."""

    def init(params):
        def zq(p, signed):
            n = _pad_len(p.size, block)
            return _QMoment(
                jnp.zeros((n,), jnp.int8 if signed else jnp.uint8),
                jnp.zeros((n // block,), jnp.float32))

        return Adam8State(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(lambda p: zq(p, True), params),
            v=jax.tree.map(lambda p: zq(p, False), params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, mq, vq):
            n = g.size
            npad = _pad_len(n, block)
            gf = jnp.pad(g.reshape(-1).astype(jnp.float32), (0, npad - n))
            m = _dq_signed(mq, block)
            sv = _dq_unsigned(vq, block)          # stored sqrt(v)
            v = sv * sv
            m = b1 * m + (1.0 - b1) * gf
            v = b2 * v + (1.0 - b2) * gf * gf
            upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
            return (upd[:n].reshape(g.shape).astype(g.dtype),
                    _q_signed(m, block), _q_unsigned(jnp.sqrt(v), block))

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        out = [leaf(g, mq, vq) for g, mq, vq in zip(flat_g, flat_m, flat_v)]
        updates = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        return updates, Adam8State(count, new_m, new_v)

    return optax.GradientTransformation(init, update)


def adam8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
             eps: float = 1e-8, block: int = _BLOCK,
             weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Drop-in for optax.adam/adamw with blockwise-INT8 moment storage."""
    chain = [scale_by_adam8(b1, b2, eps, block)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def state_nbytes(state) -> int:
    """Total bytes of the quantized moment storage (diagnostics)."""
    leaves = jax.tree.leaves(state, is_leaf=lambda x: isinstance(x, _QMoment))
    total = 0
    for q in leaves:
        if isinstance(q, _QMoment):
            total += q.codes.size * q.codes.dtype.itemsize
            total += q.scale.size * 4
    return total
