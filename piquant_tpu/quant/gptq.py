"""GPTQ: Hessian-compensated weight quantization (Frantar et al., 2022).

RTN rounds each weight independently; GPTQ rounds input-channel rows one
at a time and folds each row's rounding error back into the not-yet-
quantized rows through the inverse Hessian of the layer's inputs
(H = 2 X^T X), so later rows compensate earlier errors.  Unlike the AWQ
fold (quant/awq.py) it needs no producer op — EVERY linear (wo and w2
included) gets compensation — and composes with AWQ (scale first, then
GPTQ the scaled weights).

Grids match the runtime exactly: the per-(group, out-channel) affine
derivation is the same math as quant/linear.quantize_linear_weight
(reference src/piquant.cpp:222-259), including the bf16 scale rounding
the grouped chunk-grid kernels stream — the produced `QuantizedLinear`
is byte-compatible with RTN's and serves through the same kernels.

Group-wise mode re-derives (scale, zp) at each group boundary from the
COMPENSATED rows (the standard GPTQ-with-groups recipe).  Channelwise
mode optionally quantizes rows in descending-Hessian order (act_order);
the permutation is undone on the codes so the stored layout stays
natural — act-order with groups would need per-row group indices the
runtime layout doesn't carry, so it is rejected.

Calibration shares quant/awq.py's patched-`_mm` trick, accumulating
X^T X per linear in one eager forward (dense models; modest K — for
very large models run layer-by-layer instead of holding every Hessian).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.quant.linear import (
    QuantizedLinear,
    _grouped_cache,
    pack_split_half,
    pack_split_quarter,
)

_GPTQ_KEYS = ("wq", "wk", "wv", "wo", "w1", "w3", "w2")


def collect_hessians(
    cfg: M.LlamaConfig, params: Dict, tokens,
) -> Dict[Tuple[int, str], np.ndarray]:
    """H = X^T X per linear (the 2x and damping are applied later)."""
    if any("router" in l for l in params["layers"]):
        raise ValueError("GPTQ calibration supports dense models only")
    if any("wqkv" in l or "w13" in l for l in params["layers"]):
        raise ValueError("apply GPTQ before fuse_layer_projections")

    paths: Dict[int, Tuple[int, str]] = {}
    for li, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            if isinstance(v, jax.Array) and v.ndim == 2:
                paths[id(v)] = (li, k)

    hs: Dict[Tuple[int, str], np.ndarray] = {}
    orig = M._mm

    def patched(x, w, out_dtype, act_quant: bool = False):
        key = paths.get(id(w))
        if key is not None and not isinstance(x, jax.core.Tracer):
            x2 = np.asarray(x.astype(jnp.float32)).reshape(-1, x.shape[-1])
            h = x2.T.astype(np.float64) @ x2.astype(np.float64)
            hs[key] = hs.get(key, 0.0) + h
        return orig(x, w, out_dtype, act_quant)

    M._mm = patched
    try:
        M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    finally:
        M._mm = orig
    return hs


def _affine_grid(rows: np.ndarray, bits: int,
                 bf16_scale: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(scale, zp) per out-channel over `rows` — quantize_linear_weight's
    derivation (degenerate span -> (1.0, mid), zp clamped)."""
    qmax = (1 << bits) - 1
    rmin, rmax = rows.min(axis=0), rows.max(axis=0)
    span = rmax - rmin
    scale = np.where(span == 0, 1.0, span / qmax).astype(np.float32)
    if bf16_scale:
        scale = jnp.asarray(scale).astype(jnp.bfloat16).astype(
            jnp.float32).__array__()
    zp = np.clip(np.where(np.abs(-rmin / scale) % 1.0 == 0.5,
                          np.trunc(-rmin / scale
                                   + np.sign(-rmin / scale) * 0.5),
                          np.round(-rmin / scale)), 0, qmax)
    zp = np.where(span == 0, qmax >> 1, zp).astype(np.int32)
    return scale, zp


def gptq_quantize_linear(
    w,
    hessian: np.ndarray,
    bits: int,
    *,
    group_size: Optional[int] = None,
    percdamp: float = 0.01,
    act_order: bool = False,
) -> QuantizedLinear:
    """GPTQ-quantize one [K, N] weight against its input Hessian."""
    if act_order and group_size is not None:
        raise ValueError("act_order needs per-row group indices the "
                         "runtime layout doesn't carry; use channelwise")
    wf = np.asarray(w, np.float64).copy()
    k, n = wf.shape
    qmax = (1 << bits) - 1

    h = hessian.astype(np.float64).copy()
    dead = np.diag(h) == 0
    h[dead, dead] = 1.0
    wf[dead, :] = 0.0
    h += np.eye(k) * (percdamp * float(np.mean(np.diag(h))) + 1e-8)

    perm = (np.argsort(-np.diag(h)) if act_order
            else np.arange(k, dtype=np.int64))
    inv_perm = np.argsort(perm)
    wf = wf[perm]
    h = h[perm][:, perm]

    # upper-Cholesky of H^-1: hinv[i, i:] is the compensation row
    hinv = np.linalg.cholesky(np.linalg.inv(h), upper=True)

    codes = np.zeros((k, n), np.int32)
    if group_size is None:
        scale, zp = _affine_grid(wf, bits, bf16_scale=False)
        s_rows = np.broadcast_to(scale, (k, n))
        z_rows = np.broadcast_to(zp.astype(np.float64), (k, n))
    else:
        if k % group_size:
            raise ValueError(f"K={k} not divisible by group_size={group_size}")
        g = k // group_size
        scale = np.zeros((g, n), np.float32)
        zp = np.zeros((g, n), np.int32)
        s_rows = np.zeros((k, n))
        z_rows = np.zeros((k, n))

    for i in range(k):
        if group_size is not None and i % group_size == 0:
            gi = i // group_size
            # grid from the COMPENSATED rows of this group
            sg, zg = _affine_grid(wf[i:i + group_size], bits, bf16_scale=True)
            scale[gi], zp[gi] = sg, zg
            s_rows[i:i + group_size] = sg
            z_rows[i:i + group_size] = zg
        r = wf[i] / s_rows[i]
        c = np.clip(np.where(np.abs(r) % 1.0 == 0.5,
                             np.trunc(r + np.sign(r) * 0.5), np.round(r))
                    + z_rows[i], 0, qmax).astype(np.int32)
        codes[i] = c
        dq = (c.astype(np.float64) - z_rows[i]) * s_rows[i]
        err = (wf[i] - dq) / hinv[i, i]
        if i + 1 < k:
            wf[i + 1:] -= np.outer(hinv[i, i + 1:], err)

    codes = codes[inv_perm]
    if group_size is None:
        # channelwise convention: scale/zp are [1, N] (quant/linear.py) —
        # fuse_layer_projections and TP interleaving index axis 1
        scale = scale.reshape(1, -1)
        zp = zp.reshape(1, -1)
    cj = jnp.asarray(codes)
    if bits == 2:
        data = pack_split_quarter(cj)
    elif bits == 4:
        data = pack_split_half(cj)
    else:
        data = cj.astype(jnp.uint8)
    s_chunk = z_chunk = None
    sj = jnp.asarray(scale)
    zj = jnp.asarray(zp)
    if bits in (2, 4) and group_size is not None:
        s_chunk, z_chunk = _grouped_cache(sj, zj, k, group_size, bits)
    return QuantizedLinear(data=data, scale=sj, zero_point=zj, bits=bits,
                           k=k, group_size=group_size, s_chunk=s_chunk,
                           z_chunk=z_chunk)


def gptq_quantize_params(
    cfg: M.LlamaConfig,
    params: Dict,
    calib_tokens,
    bits: int,
    *,
    group_size: Optional[int] = None,
    percdamp: float = 0.01,
    act_order: bool = False,
    hessians: Optional[Dict] = None,
) -> Dict:
    """calibrate -> GPTQ every linear.  Drop-in for
    `llama.quantize_params(params, bits, group_size=...)`; pass
    `hessians` to reuse a previous calibration (e.g. after AWQ scaling
    of the SAME activations' model)."""
    if not isinstance(bits, int):
        raise ValueError(
            f"GPTQ supports affine grids only (bits=2/4/8), got {bits!r}; "
            "use method='rtn'/'awq' for nf4")
    if hessians is None:
        hessians = collect_hessians(cfg, params, calib_tokens)
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        ql = dict(layer)
        for k in _GPTQ_KEYS:
            if k in layer and (li, k) in hessians:
                ql[k] = gptq_quantize_linear(
                    layer[k], hessians[(li, k)], bits,
                    group_size=group_size, percdamp=percdamp,
                    act_order=act_order)
        out["layers"].append(ql)
    return out
