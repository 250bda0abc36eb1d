"""Mixed-precision auto-planner: per-projection bit allocation under a
byte budget (HAWQ-style sensitivity, greedy marginal-gain knapsack).

Uniform low-bit quantization spends its error budget evenly, but layers
differ wildly in sensitivity (the proxy's hand recipe — attention INT4 +
MLP INT2-g32 — already beat all-INT2 by 1.5 ppl).  This module automates
that choice at per-(layer, projection) granularity:

  1. measure each (projection, candidate) DAMAGE: calib-NLL delta vs the
     float model with only that one projection quantized (one forward
     each — interactions are second-order, the standard HAWQ assumption;
     scanning in a floor-quantized context instead drowns the signal in
     the other projections' noise and misranks badly: +2.69 vs this
     formulation's +0.81 ppl at the same budget on the trained proxy);
  2. start everyone at the FLOOR config (cheapest candidate);
  3. greedily buy the best marginal damage-reduction-per-byte upgrades
     until the byte budget is spent.

Validated on the 400-step trained proxy (benchmarks/ppl_quality.py):
auto-mixed at the hand recipe's exact byte budget = +0.81 ppl vs the
hand recipe's +2.06 (attn4 + mlp2-g32) — 2.5x less damage, zero manual
tuning.

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

# (bits, group_size) ladder, cheapest STREAM cost first.  int4 channelwise
# sits between int2-g32 and int4-g32: grouped scales are real traffic
# (bf16 s_chunk + int8 z_chunk = 3 B per group entry at gs=32), so
# a ladder without the channelwise rung can never express the
# attn4-channelwise + mlp2-g32 shape that hand recipes use.
CANDIDATES: Tuple[Tuple[int, Optional[int]], ...] = (
    (2, 32), (4, None), (4, 32), (8, None))


def _leaf_bytes(shape, bits: int, gs: Optional[int]) -> float:
    """Decode-path HBM traffic per weight matrix: packed codes + the side
    streams the kernels actually read (bf16 s_chunk + int8 z_chunk for
    grouped — 3 B per group entry; one f32 (scale, zp*scale) row for
    channelwise)."""
    k, n = shape[-2], shape[-1]
    e = shape[0] if len(shape) == 3 else 1
    nbits = 4 if bits == "nf4" else bits   # nf4: 4-bit codes + f32 scales
    side = (k // gs) * n * 3 if gs else n * 8
    return e * (k * n * nbits / 8 + side)


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
    # cheapest-first by per-weight stream cost (codes + side streams);
    # bits may be the "nf4" codebook name (4-bit codes)
    candidates = sorted(
        candidates,
        key=lambda c: ((4 if c[0] == "nf4" else c[0]) / 8
                       + (4 / c[1] if c[1] else 0)))
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

    assign = {(li, k): 0 for li, k, _ in keys}
    spent = plan_bytes(params, {}, floor)
    if spent > budget_bytes:
        raise ValueError(
            f"floor plan needs {spent:.0f} B > budget {budget_bytes:.0f} B")

    # Sensitivity = DAMAGE vs the float model with only ONE projection
    # quantized (the HAWQ formulation).  Measuring upgrades from the floor
    # instead (everything at int2 during the scan) drowns each projection's
    # signal in the others' noise and misranks badly: on the trained proxy
    # the floor-context variant landed at +2.69 ppl where the hand recipe
    # sat at +2.06; this variant beats the hand recipe (see
    # benchmarks/ppl_quality.py `auto-mixed @ hand budget`).
    base = _nll(cfg, params, tokens)
    damage: Dict[Tuple[int, str, int], float] = {}
    for li, k, shape in keys:
        for ci in range(len(candidates)):
            one = dict(params)
            one["layers"] = list(params["layers"])
            nl = dict(params["layers"][li])
            nl[k] = levels[(li, k, ci)]
            one["layers"][li] = nl
            d = max(_nll(cfg, one, tokens) - base, 0.0)
            if ci:  # enforce monotone damage: more bits never hurts the
                    # greedy's step gains (measurement noise otherwise
                    # strands later upgrades behind a negative middle step)
                d = min(d, damage[(li, k, ci - 1)])
            damage[(li, k, ci)] = d
        if verbose:
            print(f"  scanned {li}.{k}", flush=True)

    # marginal damage reduction per byte of each single-step upgrade
    steps = []  # (gain_per_byte, li, k, ci, dbytes, gain)
    for li, k, shape in keys:
        for ci in range(1, len(candidates)):
            dbytes = (_leaf_bytes(shape, *candidates[ci])
                      - _leaf_bytes(shape, *candidates[ci - 1]))
            gain = damage[(li, k, ci - 1)] - damage[(li, k, ci)]
            steps.append((gain / max(dbytes, 1.0), li, k, ci, dbytes, gain))

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
