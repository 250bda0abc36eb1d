"""SmoothQuant-style activation-outlier migration for W8A8 / W4A8.

Dynamic per-token int8 activation quantization (quant/linear._quantize_act,
the `act_quant_prefill` / `act_quant_decode` paths) sets ONE scale per
token from the worst channel: a single outlier channel inflates the scale
and washes out every other channel's resolution.  SmoothQuant (Xiao et
al., 2022) migrates that difficulty into the weights, which are quantized
per-channel/per-group and can absorb it:

    s_j = max|x_j|^alpha / max|W_j|^(1-alpha)        (per input channel j)
    x -> x / s   (folded into the producing RMSNorm — zero runtime cost)
    W -> s * W   (quantized as usual)

The transform is exact in float (same fold as quant/awq.py, which targets
weight-only salience with a different objective); only where the
quantization error lands changes.  `alpha=0.5` is the paper default —
equalizes activation and weight per-channel magnitudes.

Like AWQ here, the fold uses the Llama topology's two norm->projection
groups (attn_norm -> wq/wk/wv, mlp_norm -> w1/w3); wo/w2 have no foldable
producer and keep plain dynamic act quant.

The reference (pi-quant) has no quality machinery (SURVEY §2); this joins
AWQ/GPTQ/QuaRot/QAT in the BASELINE acceptance toolbox, specifically for
the act-quant serving paths where none of the others help.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.quant.awq import FOLD_GROUPS, collect_activation_stats


def smooth_scales(act_absmax: np.ndarray, weights: Sequence[np.ndarray],
                  alpha: float = 0.5) -> np.ndarray:
    """Per-input-channel migration scale for one norm->projections group.

    `act_absmax`: max |x| per channel over calibration; `weights`: the
    group's float (K, N) matrices (their per-channel absmax is combined
    with max, matching the shared input).
    """
    a = np.maximum(np.asarray(act_absmax, np.float64), 1e-8)
    w = np.maximum(
        np.max([np.max(np.abs(np.asarray(wm, np.float64)), axis=1)
                for wm in weights], axis=0), 1e-8)
    s = a ** alpha / w ** (1.0 - alpha)
    # normalize so the geometric mean is 1 (pure redistribution, keeps
    # norm weights O(1)), then clip pathological channels
    s /= np.exp(np.mean(np.log(s)))
    return np.clip(s, 1e-4, 1e4).astype(np.float32)


def apply_smooth_scales(cfg: M.LlamaConfig, params: Dict,
                        stats: Dict[Tuple[int, str], np.ndarray],
                        alpha: float = 0.5) -> Dict:
    """Float pytree with x/s folded into norms and s*W into projections.

    Exact in float; quantize the result with `llama.quantize_params`
    (weights) — the act-quant paths then see the smoothed activations.
    """
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        new = dict(layer)
        for norm_key, wkeys in FOLD_GROUPS:
            present = [k for k in wkeys if k in layer]
            if not present or (li, present[0]) not in stats:
                continue
            s = smooth_scales(
                stats[(li, present[0])],
                [np.asarray(layer[k], np.float32) for k in present],
                alpha)
            for k in present:
                new[k] = jnp.asarray(
                    s[:, None] * np.asarray(layer[k], np.float32),
                    layer[k].dtype)
            w = np.asarray(layer[norm_key], np.float32)
            folded = ((1.0 + w) / s - 1.0) if cfg.norm_plus_one else w / s
            new[norm_key] = jnp.asarray(folded, layer[norm_key].dtype)
        out["layers"].append(new)
    return out


def smooth_quantize_params(cfg: M.LlamaConfig, params: Dict, calib_tokens,
                           bits: int, *, alpha: float = 0.5,
                           group_size=None, **quantize_kw) -> Dict:
    """calibrate (absmax) -> migrate outliers -> weight-only quantize.

    Use with cfg.act_quant_prefill / act_quant_decode: the migrated
    activations quantize cleanly per token while the weights absorb the
    outlier channels into their per-channel/-group scales."""
    stats = collect_activation_stats(cfg, params, calib_tokens,
                                     stat="absmax")
    scaled = apply_smooth_scales(cfg, params, stats, alpha=alpha)
    return M.quantize_params(scaled, bits, group_size=group_size,
                             **quantize_kw)
