"""Offline orthogonal rotation of the residual stream (QuaRot-style
incoherence processing) for low-bit weight quality.

Big outlier channels are what break 2-4 bit quantization: one hot channel
inflates the group scale and washes out every other weight's codes.  An
orthogonal rotation R of the residual stream mixes every channel into every
other, flattening outliers (incoherence), while leaving the MODEL FUNCTION
exactly unchanged — RMSNorm is rotation-equivariant once its per-channel
scale is folded into the consumer projections:

    rms_norm(x R, 1) = rms_norm(x, 1) R        (||xR|| == ||x||)

so rotating every residual-stream producer by R and every consumer by R^T
is an exact reparameterization (up to float rounding).  The rotation is
absorbed OFFLINE into the weights — zero runtime cost — and the quantizer
then sees outlier-free matrices.  Compose with GPTQ for the full QuaRot
recipe: ``rotate_params`` -> ``gptq_quantize_params``.

Producers (weights written into the residual stream, transformed w @ R):
    embed, wo (+bo), w2, moe_w2 (+moe_b2), shared_w2
Consumers (weights reading the residual stream, transformed R^T @ w):
    wq, wk, wv, w1, w3, router, moe_w1, moe_w3,
    shared_w1, shared_w3, shared_gate, lm_head
Everything that lives in head space or expert-hidden space (rotary, qk-norm,
attention sinks, bq/bk/bv, moe_b1/b3, softcaps) commutes with R untouched.

Reference: pi-quant has no rotation pass (its scope ends at the tensor
quantizer, src/piquant.cpp:277-369); this extends the quality toolkit the
same way quant/awq.py and quant/gptq.py do.  Method: QuaRot
(arXiv:2404.00456) / SliceGPT's computational-invariance observation.

Not supported (raises ValueError):
  * cfg.sandwich_norms (Gemma-2/3): the post-block RMSNorms re-normalize the
    sublayer OUTPUT; their per-channel scale cannot be folded through the
    nonlinear 1/rms factor, so the stream is not rotation-invariant there.
  * already-quantized or projection-fused params (rotate FIRST).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from piquant_tpu.quant.linear import QuantizedLinear

__all__ = ["rotation_matrix", "fold_norms", "rotate_params"]


# ---------------------------------------------------------------------------
# rotation construction
# ---------------------------------------------------------------------------

def _sylvester(k: int) -> np.ndarray:
    """Hadamard matrix of order 2**k (entries +-1), Sylvester recursion."""
    h = np.ones((1, 1), np.float64)
    for _ in range(k):
        h = np.block([[h, h], [h, -h]])
    return h


def rotation_matrix(d: int, seed: int = 0) -> np.ndarray:
    """Random orthogonal (d, d) float64 matrix, Hadamard-structured.

    d = 2**k * m: R = (H_{2^k}/sqrt(2^k)) kron Q_m, right-multiplied by a
    random +-1 diagonal (the classic randomized-Hadamard sign flip).  Q_m is
    a small QR-orthogonal block for the odd factor (m=3 covers d_model=3072,
    m=5 covers 5120; m=1 is the pure Hadamard case).  Kronecker keeps the
    construction O(d^2) for every real d_model instead of a full d^3 QR.
    """
    if d <= 0:
        raise ValueError(f"rotation dimension must be positive, got {d}")
    rng = np.random.default_rng(seed)
    k = 0
    m = d
    while m % 2 == 0:
        m //= 2
        k += 1
    h = _sylvester(k) / np.sqrt(2.0 ** k)
    if m == 1:
        r = h
    else:
        q, _r = np.linalg.qr(rng.standard_normal((m, m)))
        r = np.kron(h, q)
    signs = rng.choice([-1.0, 1.0], size=d)
    return r * signs[None, :]


# ---------------------------------------------------------------------------
# norm folding
# ---------------------------------------------------------------------------

# residual-stream consumers per norm key (missing keys skipped per layer)
_ATTN_CONSUMERS = ("wq", "wk", "wv")
_MLP_CONSUMERS = ("w1", "w3", "router", "moe_w1", "moe_w3",
                  "shared_w1", "shared_w3", "shared_gate")


def _check_float(layer: Dict) -> None:
    for k, v in layer.items():
        if isinstance(v, QuantizedLinear) or hasattr(v, "n_experts"):
            raise ValueError(
                "rotate/fold operates on FLOAT params; quantize afterwards "
                f"(found quantized leaf {k!r})")


def _gain(w, plus_one: bool) -> np.ndarray:
    g = np.asarray(w, np.float64)
    return 1.0 + g if plus_one else g


def _unit_norm(like, plus_one: bool):
    z = np.zeros_like(np.asarray(like, np.float64)) if plus_one else \
        np.ones_like(np.asarray(like, np.float64))
    return jnp.asarray(z, like.dtype)


def _scale_rows(w, g: np.ndarray):
    """diag(g) @ w for 2-D [d, n] or stacked 3-D [E, d, n] weights."""
    a = np.asarray(w, np.float64)
    scaled = a * (g[:, None] if a.ndim == 2 else g[None, :, None])
    return jnp.asarray(scaled, w.dtype)


def fold_norms(cfg, params: Dict) -> Dict:
    """Fold every RMSNorm per-channel scale into its consumer projections.

    After this the norms are pure 1/rms normalizers (weight == identity) and
    the stream is rotation-equivariant.  Also a useful standalone pre-pass:
    the quantizer sees the true per-channel magnitudes the matmuls consume.
    """
    if getattr(cfg, "sandwich_norms", False):
        raise ValueError(
            "sandwich_norms (Gemma-2/3) post-block norms cannot be folded: "
            "the 1/rms factor is nonlinear in the sublayer output")
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        _check_float(layer)
        if "wqkv" in layer or "w13" in layer:
            raise ValueError("rotate/fold before fuse_layer_projections")
        nl = dict(layer)
        for norm_key, consumers in (("attn_norm", _ATTN_CONSUMERS),
                                    ("mlp_norm", _MLP_CONSUMERS)):
            g = _gain(nl[norm_key], cfg.norm_plus_one)
            for c in consumers:
                if c in nl:
                    nl[c] = _scale_rows(nl[c], g)
            nl[norm_key] = _unit_norm(nl[norm_key], cfg.norm_plus_one)
        out["layers"].append(nl)
    g = _gain(params["final_norm"], cfg.norm_plus_one)
    out["lm_head"] = _scale_rows(params["lm_head"], g)
    out["final_norm"] = _unit_norm(params["final_norm"], cfg.norm_plus_one)
    return out


# ---------------------------------------------------------------------------
# rotation absorption
# ---------------------------------------------------------------------------

# (key, side): "in" consumers get R^T @ w, "out" producers get w @ R.
_ROTATE_SIDES: Tuple[Tuple[str, str], ...] = (
    ("wq", "in"), ("wk", "in"), ("wv", "in"),
    ("w1", "in"), ("w3", "in"), ("router", "in"),
    ("moe_w1", "in"), ("moe_w3", "in"),
    ("shared_w1", "in"), ("shared_w3", "in"), ("shared_gate", "in"),
    ("wo", "out"), ("bo", "out"), ("w2", "out"),
    ("moe_w2", "out"), ("moe_b2", "out"), ("shared_w2", "out"),
)


def _rot(w, r: np.ndarray, side: str):
    a = np.asarray(w, np.float64)
    if side == "in":        # w' = R^T @ w  (works for [d,n] and [E,d,n])
        res = np.einsum("ji,...jn->...in", r, a)
    else:                   # w' = w @ R    (row vectors included: [d]/[E,d])
        res = a @ r
    return jnp.asarray(res, w.dtype)


def rotate_params(cfg, params: Dict, seed: int = 0) -> Dict:
    """fold_norms + absorb a random orthogonal R into every producer and
    consumer of the residual stream.  Exact reparameterization: logits match
    the input model to float-rounding noise; quantization quality improves
    because per-channel outliers are mixed away.  Zero runtime cost."""
    params = fold_norms(cfg, params)
    r = rotation_matrix(cfg.d_model, seed)
    out = dict(params)
    out["embed"] = _rot(params["embed"], r, "out")
    out["lm_head"] = _rot(params["lm_head"], r, "in")
    out["layers"] = []
    for layer in params["layers"]:
        nl = dict(layer)
        for key, side in _ROTATE_SIDES:
            if key in nl:
                nl[key] = _rot(nl[key], r, side)
        out["layers"].append(nl)
    return out
