"""Mixed-precision auto-planner: per-projection bit allocation under a
byte budget (HAWQ-style sensitivity, greedy marginal-gain knapsack).

Uniform low-bit quantization spends its error budget evenly, but layers
differ wildly in sensitivity (the proxy's hand recipe — attention INT4 +
MLP INT2-g32 — already beat all-INT2 by 1.5 ppl).  This module automates
that choice at per-(layer, projection) granularity:

  1. quantize every projection at the FLOOR config (cheapest candidate);
  2. for each projection and each upgrade config, measure the calib-NLL
     gain of upgrading just that one projection (one forward each —
     interactions are second-order, the standard HAWQ assumption);
  3. greedily buy the best marginal gain-per-byte upgrades until the
     byte budget is spent.

The plan is an `overrides` dict for `llama.quantize_params` (per-layer
keys `"{li}.{name}"`), so the runtime kernels are untouched — this is a
pure calibration-time component, same contract as quant/gptq.py.

Reference: pi-quant's scope ends at the tensor quantizer; this extends
the quality toolkit like awq/gptq/rotate do.  Method: HAWQ-v2-flavoured
knockout sensitivity (arXiv:1911.03852) without Hessian traces — direct
NLL deltas are exact at this granularity and cost one forward each.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.quant.linear import quantize_linear_weight

__all__ = ["plan_mixed_precision", "plan_bytes", "CANDIDATES"]

# (bits, group_size) ladder, cheapest first.  Bytes/weight: packed codes
# + f32 (scale, zp) per group/channel.
CANDIDATES: Tuple[Tuple[int, Optional[int]], ...] = ((2, 32), (4, 32),
                                                     (8, None))


def _leaf_bytes(shape, bits: int, gs: Optional[int]) -> float:
    k, n = shape[-2], shape[-1]
    e = shape[0] if len(shape) == 3 else 1
    groups = (k // gs) if gs else 1
    return e * (k * n * bits / 8 + groups * n * 8)


def _proj_keys(params) -> List[Tuple[int, str, Tuple[int, ...]]]:
    keys = []
    for li, layer in enumerate(params["layers"]):
        for k in M._QUANT_KEYS + M._MOE_QUANT_KEYS:
            if k in layer:
                keys.append((li, k, tuple(np.shape(layer[k]))))
    return keys


def _nll(cfg, qparams, tokens) -> float:
    logits, _ = M.forward(cfg, qparams, tokens[:, :-1],
                          attend_in_layer=True)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return float(-jnp.take_along_axis(lp, tokens[:, 1:, None], -1).mean())


def plan_bytes(params, plan: Dict[str, Tuple[int, Optional[int]]],
               floor: Tuple[int, Optional[int]] = CANDIDATES[0]) -> float:
    """Total packed bytes of the quantized projections under `plan`."""
    total = 0.0
    for li, k, shape in _proj_keys(params):
        b, gs = plan.get(f"{li}.{k}", floor)
        total += _leaf_bytes(shape, b, gs)
    return total


def plan_mixed_precision(
    cfg,
    params: Dict,
    calib_tokens,                       # [B, T] int32
    budget_bytes: float,                # total packed-projection bytes
    candidates: Sequence[Tuple[int, Optional[int]]] = CANDIDATES,
    verbose: bool = False,
) -> Dict[str, Tuple[int, Optional[int]]]:
    """Per-projection (bits, group_size) plan under `budget_bytes`.

    Returns an `overrides` dict for `quantize_params` with every
    projection assigned explicitly (per-layer keys).  The floor plan
    (all projections at candidates[0]) must fit the budget."""
    candidates = sorted(candidates, key=lambda c: c[0])
    floor = candidates[0]
    keys = _proj_keys(params)
    tokens = jnp.asarray(calib_tokens, jnp.int32)

    # pre-quantize each projection at each candidate once
    levels: Dict[Tuple[int, str, int], object] = {}
    for li, k, _ in keys:
        w = params["layers"][li][k]
        for ci, (b, gs) in enumerate(candidates):
            if np.ndim(w) == 3:
                from piquant_tpu.quant.linear import QuantizedExpertStack

                q = QuantizedExpertStack.stack([
                    quantize_linear_weight(w[e], b, group_size=gs)
                    for e in range(w.shape[0])])
            else:
                q = quantize_linear_weight(w, b, group_size=gs)
            levels[(li, k, ci)] = q

    def assemble(assign: Dict[Tuple[int, str], int]):
        out = dict(params)
        out["layers"] = []
        for li, layer in enumerate(params["layers"]):
            nl = dict(layer)
            for k in M._QUANT_KEYS + M._MOE_QUANT_KEYS:
                if k in layer:
                    nl[k] = levels[(li, k, assign[(li, k)])]
            out["layers"].append(nl)
        return out

    assign = {(li, k): 0 for li, k, _ in keys}
    spent = plan_bytes(params, {}, floor)
    if spent > budget_bytes:
        raise ValueError(
            f"floor plan needs {spent:.0f} B > budget {budget_bytes:.0f} B")
    base = _nll(cfg, assemble(assign), tokens)

    # marginal gain of each single-step upgrade, measured from the floor
    steps = []  # (gain_per_byte, li, k, ci, dbytes, gain)
    for li, k, shape in keys:
        prev_nll, prev_bytes = base, _leaf_bytes(shape, *candidates[0])
        for ci in range(1, len(candidates)):
            trial = dict(assign)
            trial[(li, k)] = ci
            nll = _nll(cfg, assemble(trial), tokens)
            dbytes = _leaf_bytes(shape, *candidates[ci]) - prev_bytes
            gain = prev_nll - nll
            steps.append((gain / max(dbytes, 1.0), li, k, ci, dbytes, gain))
            prev_nll = nll
            prev_bytes = _leaf_bytes(shape, *candidates[ci])
        if verbose:
            print(f"  scanned {li}.{k}", flush=True)

    # greedy: buy the best marginal upgrades first; each projection's
    # steps must be taken in order (ci valid only after ci-1), so sweep
    # until a pass buys nothing
    ordered = sorted(steps, reverse=True)
    changed = True
    while changed:
        changed = False
        for gpb, li, k, ci, dbytes, gain in ordered:
            if gain <= 0:
                continue
            if assign[(li, k)] == ci - 1 and spent + dbytes <= budget_bytes:
                assign[(li, k)] = ci
                spent += dbytes
                changed = True

    return {f"{li}.{k}": candidates[ci] for (li, k), ci in assign.items()}
