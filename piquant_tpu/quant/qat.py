"""Quantization-aware training utilities.

The reference's fused requantize (kernels.inl:30-52) is the fake-quant
primitive; here it becomes differentiable via the straight-through estimator
(custom_vjp: forward = quantize->dequantize, backward = identity inside the
representable range, zero outside — the clipped-STE used by QAT recipes).
Works with nearest or stochastic rounding (stochastic + unbiasedness is the
better gradient estimator; see the collectives rationale).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp

from piquant_tpu.dtypes import QDType, dtype_of
from piquant_tpu.ops import dispatch as _ops

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fake_quant(x: Array, scale, zero_point, qdtype: str,
               round_mode: str = "nearest", key: Optional[Array] = None) -> Array:
    """Differentiable quantize->dequantize (STE backward)."""
    return _fq_fwd_value(x, scale, zero_point, qdtype, round_mode, key)


def _fq_fwd_value(x, scale, zero_point, qdtype, round_mode, key):
    dt = dtype_of(qdtype)
    out = _ops.requantize(x.reshape(-1), scale, zero_point, dt, round_mode,
                          "set", None, key=key)
    return out.reshape(x.shape).astype(x.dtype)


def _fq_fwd(x, scale, zero_point, qdtype, round_mode, key=None):
    y = _fq_fwd_value(x, scale, zero_point, qdtype, round_mode, key)
    return y, (x, jnp.asarray(scale, jnp.float32),
               jnp.asarray(zero_point, jnp.int32))


def _fq_bwd(qdtype, round_mode, res, g):
    x, scale, zp = res
    dt = dtype_of(qdtype)
    # clipped STE: pass gradients only where x lands inside the code range
    lo = (dt.qmin - zp.astype(jnp.float32)) * scale
    hi = (dt.qmax - zp.astype(jnp.float32)) * scale
    xf = x.astype(jnp.float32)
    inside = jnp.logical_and(xf >= lo, xf <= hi)
    gx = jnp.where(inside, g.astype(jnp.float32), 0.0).astype(x.dtype)
    return gx, None, None, None


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def fake_quant_params(params, qdtype: str = "int4", *, keys=("w",),
                      round_mode: str = "nearest"):
    """Map fake_quant over selected float leaves of a param pytree (simple
    whole-tensor QAT; per-layer scale derived from data)."""
    from piquant_tpu.ops.reference import compute_quant_params

    def visit(leaf):
        if not hasattr(leaf, "dtype") or leaf.dtype == jnp.int32:
            return leaf
        s, z = compute_quant_params(leaf.reshape(-1), dtype_of(qdtype))
        return fake_quant(leaf, s, z, qdtype, round_mode)

    return jax.tree.map(visit, params)


def fake_quant_weight(w: Array, bits: int = 4, *,
                      group_size: Optional[int] = None,
                      channelwise: bool = True) -> Array:
    """Differentiable weight fake-quant matching quantize_linear_weight's
    granularity (per-channel or group-wise) — the QAT counterpart of the
    weight-only serving path.  Straight-through estimator via the
    x + stop_grad(dq(x) - x) identity."""
    from piquant_tpu.quant.linear import quantize_linear_weight

    ql = quantize_linear_weight(w, bits, channelwise=channelwise,
                                group_size=group_size)
    dq = ql.dequantize(jnp.float32).astype(w.dtype)
    return w + jax.lax.stop_gradient(dq - w)


def fake_quant_model_weights(params, bits: int = 4, *,
                             group_size: Optional[int] = None,
                             keys=("wq", "wk", "wv", "wo", "w1", "w2", "w3")):
    """Apply fake_quant_weight to the named 2-D projection leaves of a
    llama-style param pytree (QAT forward for weight-only serving)."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        for k in keys:
            if k in nl:
                nl[k] = fake_quant_weight(nl[k], bits, group_size=group_size)
        out["layers"].append(nl)
    return out
