"""Activation-aware weight scaling (AWQ-style) for low-bit quantization.

Low-bit RTN quantization hurts most on the input channels that carry the
largest activations: their weight error is multiplied by a big |x|.  AWQ
(Lin et al., 2023) rescales weights per input channel — W -> s*W with the
inverse folded into the producer op — so the quantizer spends its step
budget where activations are large.  The transform is mathematically
exact in float (`(x/s) @ (sW) == x @ W`); only the quantization error
distribution changes.

This implementation folds the inverse scale into the RMSNorm that feeds
each projection group (the only fold the Llama topology needs):

    attn_norm -> {wq, wk, wv}       mlp_norm -> {w1, w3}

so there is ZERO runtime cost — no extra ops, the serving path is
unchanged.  `wo`/`w2` have no foldable producer (attention output / GLU
product) and keep plain RTN, as in the original AWQ.  The per-group
scale exponent alpha is grid-searched per layer against the
activation-weighted reconstruction error of the actual quantizer
(`quant/linear.quantize_linear_weight`), AWQ's search reduced to its
essentials.

Scope: dense (non-MoE) Llama-family models, pre-fusion pytrees (apply
before `fuse_layer_projections`).  Calibration runs the float model
eagerly with a patched `_mm` to collect mean |input| per channel — no
hooks framework needed for a functional model.

The reference (pi-quant) has no quality machinery at all; this extends
the BASELINE "within 0.1 ppl" acceptance toolbox (with QAT in
quant/qat.py) for the INT2/INT3 regime where plain RTN fails.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.quant.linear import quantize_linear_weight

# norm -> the projections it feeds (per layer)
FOLD_GROUPS: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("attn_norm", ("wq", "wk", "wv")),
    ("mlp_norm", ("w1", "w3")),
)


def collect_activation_stats(
    cfg: M.LlamaConfig, params: Dict, tokens,
    stat: str = "mean",
) -> Dict[Tuple[int, str], np.ndarray]:
    """Per-input-channel activation statistic for every 2-D float linear.

    `stat="mean"` records mean |x| per channel (the AWQ salience proxy);
    `stat="absmax"` records the running max |x| (what SmoothQuant's
    migration objective needs — per-token int8 scales are set by the
    worst channel, quant/smooth.py).

    Runs ONE eager forward over the calibration batch with `llama._mm`
    patched to record its `x` operand (keyed by weight identity ->
    (layer, name)).  Works on float (unquantized) params; MoE layers are
    rejected (their expert scan traces `_mm`, hiding concrete values).
    """
    if stat not in ("mean", "absmax"):
        raise ValueError(f"stat must be 'mean' or 'absmax', got {stat!r}")
    if any("router" in l for l in params["layers"]):
        raise ValueError("AWQ calibration supports dense models only "
                         "(MoE expert scans hide activations)")
    if any("wqkv" in l or "w13" in l for l in params["layers"]):
        raise ValueError("apply AWQ before fuse_layer_projections")

    paths: Dict[int, Tuple[int, str]] = {}
    for li, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            if isinstance(v, jax.Array) and v.ndim == 2:
                paths[id(v)] = (li, k)

    sums: Dict[Tuple[int, str], np.ndarray] = {}
    counts: Dict[Tuple[int, str], int] = {}
    orig = M._mm

    def patched(x, w, out_dtype, act_quant: bool = False):
        key = paths.get(id(w))
        if key is not None and not isinstance(x, jax.core.Tracer):
            ax = jnp.abs(x.astype(jnp.float32))
            red = tuple(range(x.ndim - 1))
            a = np.asarray(jnp.max(ax, axis=red) if stat == "absmax"
                           else jnp.mean(ax, axis=red))
            if key in sums:
                if stat == "absmax":
                    np.maximum(sums[key], a, out=sums[key])
                else:
                    sums[key] += a
                counts[key] += 1
            else:
                sums[key] = a
                counts[key] = 1
        return orig(x, w, out_dtype, act_quant)

    M._mm = patched
    try:
        M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    finally:
        M._mm = orig
    if stat == "absmax":
        return dict(sums)
    return {k: sums[k] / counts[k] for k in sums}


def _group_scale(
    mean_abs: np.ndarray,
    weights: Sequence[np.ndarray],
    bits: int,
    group_size: Optional[int],
    alphas: Sequence[float],
) -> np.ndarray:
    """Grid-search s = (m/gm(m))^alpha minimizing the activation-weighted
    reconstruction error of the group's quantized weights."""
    m = np.maximum(mean_abs.astype(np.float64), 1e-8)
    gm = float(np.exp(np.mean(np.log(m))))
    best_s, best_err = np.ones_like(m, np.float32), np.inf
    for a in alphas:
        s = np.clip((m / gm) ** a, 1e-4, 1e4).astype(np.float32)
        err = 0.0
        for w in weights:
            sw = jnp.asarray(s[:, None] * w)
            ql = quantize_linear_weight(sw, bits, group_size=group_size)
            deq = np.asarray(ql.dequantize(jnp.float32)) / s[:, None]
            err += float(np.sum((m[:, None] * (w - deq)) ** 2))
        if err < best_err:
            best_err, best_s = err, s
    return best_s


def apply_awq_scales(
    cfg: M.LlamaConfig,
    params: Dict,
    stats: Dict[Tuple[int, str], np.ndarray],
    bits: int,
    group_size: Optional[int] = None,
    alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
) -> Dict:
    """Float pytree with the chosen scales folded in: projections get
    s*W, their producing norm gets w/s (exact in float; alpha=0 is the
    identity).  Quantize the result with the SAME (bits, group_size)."""
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        new = dict(layer)
        for norm_key, wkeys in FOLD_GROUPS:
            present = [k for k in wkeys if k in layer]
            if not present or (li, present[0]) not in stats:
                continue
            s = _group_scale(
                stats[(li, present[0])],
                [np.asarray(layer[k], np.float32) for k in present],
                bits, group_size, alphas)
            for k in present:
                new[k] = jnp.asarray(
                    s[:, None] * np.asarray(layer[k], np.float32),
                    layer[k].dtype)
            w = np.asarray(layer[norm_key], np.float32)
            folded = ((1.0 + w) / s - 1.0) if cfg.norm_plus_one else w / s
            new[norm_key] = jnp.asarray(folded, layer[norm_key].dtype)
        out["layers"].append(new)
    return out


def awq_quantize_params(
    cfg: M.LlamaConfig,
    params: Dict,
    calib_tokens,
    bits: int,
    *,
    group_size: Optional[int] = None,
    alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
    **quantize_kw,
) -> Dict:
    """calibrate -> fold scales -> weight-only quantize.  Drop-in where
    `llama.quantize_params(params, bits, group_size=...)` is used."""
    stats = collect_activation_stats(cfg, params, calib_tokens)
    scaled = apply_awq_scales(cfg, params, stats, bits,
                              group_size=group_size, alphas=alphas)
    return M.quantize_params(scaled, bits, group_size=group_size,
                             **quantize_kw)
