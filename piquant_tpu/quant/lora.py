"""QLoRA-style adapter fine-tuning: frozen low-bit base + trainable
low-rank deltas (Dettmers et al., 2023; Hu et al., 2021).

The base weights stay PACKED (INT2/INT4/INT8 `QuantizedLinear` — the same
buffers the serving kernels stream); training touches only the rank-r
factors, so the optimizer state is O(r·(K+N)) per projection instead of
O(K·N), and the forward reuses the fused dequant+matmul kernels verbatim:

    y = quantized_matmul(x, base) + (x @ A) @ B * (alpha / r)

Training never takes gradients through the base: optimize the ADAPTER
pytree (`lora_params` / `with_lora`) as the sole `jax.grad` argument — the
packed base rides along as a closed-over constant, which is both the
QLoRA semantics and the cheapest possible implementation.  Composes with
train.make_train_step / make_zero_train_step unchanged.

Serving: `LoraLinear` is a pytree, so the engine serves adapter models
directly (per-tenant adapters over one shared base); `merge_lora`
re-quantizes base+delta back to plain `QuantizedLinear` for zero-overhead
deployment.

Reference: extends the reference's requantize primitive
(src/piquant.cpp:342-369) into a fine-tuning story the same way
quant/qat.py does — rounding error becomes a training residual.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from piquant_tpu.quant.linear import QuantizedLinear, quantize_linear_weight

Array = jax.Array

LORA_KEYS = ("wq", "wk", "wv", "wo", "w1", "w3", "w2")
# MLA (models/mla.py) projections that route through _mm and can carry
# adapters; kv_a/kv_b are EXCLUDED — absorbed decode materializes them
# into the attention weights, which would silently drop a LoRA delta
MLA_LORA_KEYS = ("wq", "wq_a", "wq_b", "wo", "w1", "w3", "w2")

__all__ = ["LoraLinear", "MultiLoraLinear", "LORA_KEYS", "add_lora",
           "lora_params", "with_lora", "merge_lora", "stack_adapters",
           "set_adapter_ids", "n_adapters"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoraLinear:
    """Frozen (packed or float) base + trainable rank-r delta."""

    base: QuantizedLinear  # or float [K, N]
    a: Array               # [K, r]
    b: Array               # [r, N]
    alpha: float = 16.0

    @property
    def scaling(self) -> float:
        return self.alpha / self.a.shape[-1]

    def tree_flatten(self):
        return (self.base, self.a, self.b), (self.alpha,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, a, b = children
        return cls(base, a, b, aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MultiLoraLinear:
    """ONE shared (packed) base + a STACK of adapters, selected per batch
    row — multi-tenant LoRA serving (the S-LoRA pattern):

        y[b] = base(x[b]) + (x[b] @ A[ids[b]]) @ B[ids[b]] * scaling[ids[b]]

    `ids` [B] int32 is a pytree LEAF: the engine swaps it per dispatch via
    `set_adapter_ids` (a pure tree rebuild — the big A/B/base buffers are
    shared references, only the tiny id vector changes), so any mix of
    tenants serves in one compiled decode block.  By `stack_adapters`
    convention adapter 0 is the NULL adapter (zero delta) for requests
    without one.  Per-step cost: two rank-r einsums against the B gathered
    adapters — ~2% of the packed-weight stream at r=16 on 8B geometry."""

    base: QuantizedLinear   # or float [K, N]
    a: Array                # [L, K, r]
    b: Array                # [L, r, N]
    scaling: Array          # [L] f32 (alpha / r per adapter)
    ids: Array              # [B] int32 — adapter index per batch row

    def tree_flatten(self):
        return (self.base, self.a, self.b, self.scaling, self.ids), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_adapters(self) -> int:
        return self.a.shape[0]


def stack_adapters(base_params: Dict, adapter_param_sets,
                   include_null: bool = True,
                   keys: Sequence[str] = LORA_KEYS) -> Dict:
    """Build a multi-tenant tree from a shared base + N single-adapter
    LoRA trees (each an `add_lora`/trained tree over the SAME base).

    Adapter indices follow list order, shifted by one when `include_null`
    (index 0 = zero delta — the convention Engine requests with
    adapter_id=0 rely on).  All adapters of one projection must share
    rank (pad or retrain otherwise)."""
    out = dict(base_params)
    out["layers"] = []
    for li, layer in enumerate(base_params["layers"]):
        nl = dict(layer)
        for k in keys:
            if k not in layer:
                continue
            base = layer[k]
            if isinstance(base, (LoraLinear, MultiLoraLinear)):
                base = base.base
            per = []
            for ap in adapter_param_sets:
                v = ap["layers"][li][k]
                if not isinstance(v, LoraLinear):
                    raise ValueError(f"adapter set missing LoraLinear at "
                                     f"layer {li} key {k!r}")
                per.append(v)
            ranks = {v.a.shape[-1] for v in per}
            if len(ranks) != 1:
                raise ValueError(f"{li}.{k}: adapters must share rank, "
                                 f"got {sorted(ranks)}")
            a = jnp.stack([v.a for v in per])
            b = jnp.stack([v.b for v in per])
            s = jnp.asarray([v.scaling for v in per], jnp.float32)
            if include_null:
                a = jnp.concatenate([jnp.zeros_like(a[:1]), a])
                b = jnp.concatenate([jnp.zeros_like(b[:1]), b])
                s = jnp.concatenate([jnp.ones((1,), jnp.float32), s])
            nl[k] = MultiLoraLinear(base, a, b, s,
                                    jnp.zeros((1,), jnp.int32))
        out["layers"].append(nl)
    return out


def set_adapter_ids(params: Dict, ids) -> Dict:
    """Rebuild the tree with `ids` ([B] int32) on every MultiLoraLinear
    leaf (pure restructure: all weight buffers are shared references)."""
    ids = jnp.asarray(ids, jnp.int32)

    def sub(layer):
        return {k: (dataclasses.replace(v, ids=ids)
                    if isinstance(v, MultiLoraLinear) else v)
                for k, v in layer.items()}

    out = dict(params)
    out["layers"] = [sub(l) for l in params["layers"]]
    return out


def n_adapters(params: Dict) -> Optional[int]:
    """Adapter count of the first MultiLoraLinear leaf (None if no
    multi-LoRA in the tree)."""
    for layer in params.get("layers", []):
        for v in layer.values():
            if isinstance(v, MultiLoraLinear):
                return v.n_adapters
    return None


def add_lora(params: Dict, rank: int, key: Array,
             keys: Sequence[str] = LORA_KEYS, alpha: float = 16.0,
             dtype=jnp.float32) -> Dict:
    """Wrap every `keys` projection in a LoraLinear.  A ~ N(0, 1/r),
    B = 0 — the model function is initially UNCHANGED (delta starts at
    zero), the standard LoRA init."""
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        for k in keys:
            if k not in layer:
                continue
            w = layer[k]
            kin = w.k if isinstance(w, QuantizedLinear) else w.shape[0]
            n = w.n if hasattr(w, "n") else w.shape[1]
            ka = jax.random.fold_in(jax.random.fold_in(key, li), hash(k) % (1 << 31))
            a = (jax.random.normal(ka, (kin, rank), dtype)
                 * (1.0 / rank) ** 0.5)
            nl[k] = LoraLinear(w, a, jnp.zeros((rank, n), dtype), alpha)
        out["layers"].append(nl)
    return out


def lora_params(params: Dict) -> Dict:
    """The trainable pytree: {layer_idx: {key: (A, B)}}."""
    out = {}
    for li, layer in enumerate(params["layers"]):
        sub = {k: (v.a, v.b) for k, v in layer.items()
               if isinstance(v, LoraLinear)}
        if sub:
            out[li] = sub
    return out


def with_lora(params: Dict, adapters: Dict) -> Dict:
    """Substitute `adapters` (the lora_params structure) into a LoRA-
    wrapped param tree.  Pass the ADAPTERS as the jax.grad argument and
    call this inside the loss — gradients then exist only for A/B."""
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        for k, (a, b) in adapters.get(li, {}).items():
            old = layer[k]
            nl[k] = LoraLinear(old.base, a, b, old.alpha)
        out["layers"].append(nl)
    return out


def merge_lora(params: Dict) -> Dict:
    """Fold every adapter into its base and re-quantize at the base's own
    (bits, group_size): zero-overhead deployment.  Float bases merge
    exactly; quantized bases absorb one extra rounding (the requantize
    primitive's error bound applies)."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        for k, v in layer.items():
            if not isinstance(v, LoraLinear):
                continue
            delta = (v.a.astype(jnp.float32) @ v.b.astype(jnp.float32)
                     ) * v.scaling
            if isinstance(v.base, QuantizedLinear):
                w = v.base.dequantize(jnp.float32) + delta
                nl[k] = quantize_linear_weight(
                    w, v.base.codebook or v.base.bits,
                    group_size=v.base.group_size)
            else:
                nl[k] = (v.base.astype(jnp.float32) + delta
                         ).astype(v.base.dtype)
        out["layers"].append(nl)
    return out
