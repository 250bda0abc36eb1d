"""Multi-head Latent Attention (DeepSeek-V2 style), TPU-native, with an
INT8-quantized LATENT KV cache.

MLA compresses each position's K/V into one rank-R latent vector
(`kv_a_proj`) plus a small shared rope key; the per-head K/V never need to
be cached because the decode path ABSORBS the up-projection `kv_b_proj`
into the query and output sides:

    q_nope[h] . k_nope[h,s] = (W_k[h] q_nope[h]) . c_s        (score side)
    sum_s p[s] v[h,s]       = W_v[h]^T (sum_s p[s] c_s)       (output side)

so decode attention reads only the latent cache — R + rope_dim values per
position instead of 2 * H * head_dim (Llama-8B INT8 KV: 2048 B/pos; here
R=512 + 64 rope = ~0.6 KB/pos at INT8).  This is the natural companion of
this framework's quantization primitives: the latent c is per-token
INT8-affine quantized exactly like the dense KV cache (quant/kv_cache.py),
and all projections take QuantizedLinear weights.

Rope convention: the installed transformers DeepseekV2 applies rope as a
COMPLEX multiply over (even, odd) pairs — the same interleaved convention
as models/llama.py::apply_rope — so the loader needs NO column permutation
(cf. loader.py's GPT-NeoX trick for the half-rotation families).

Scope: full DeepSeek-V2 geometry — dense-MLP (V2-Lite style) AND the
MoE-MLA combination (DeepSeek-MoE routed + shared experts,
`first_k_dense_replace` mixed layers) with YaRN rope scaling.  Reference
parity anchor: this subsystem extends SURVEY.md §5's "INT8 KV-cache"
serving component to the MLA cache layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from piquant_tpu.models.llama import apply_rope, rms_norm
from piquant_tpu.quant.linear import (
    QuantizedExpertStack,
    QuantizedLinear,
    quantize_linear_weight,
    quantized_matmul,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class YarnParams:
    """YaRN rope scaling (DeepSeek-V2's long-context recipe).

    Matches transformers' _compute_yarn_parameters
    (modeling_rope_utils.py): interpolated/extrapolated inverse-frequency
    mix with a linear ramp over the rotary dims, and an attention factor
    (from mscale/mscale_all_dim) multiplying cos AND sin."""

    factor: float = 1.0
    original_max_position_embeddings: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0


@dataclasses.dataclass(frozen=True)
class MLAConfig:
    vocab_size: int = 102_400
    d_model: int = 5120
    n_layers: int = 60
    n_heads: int = 128
    d_ff: int = 12_288
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None   # None: plain q_proj (V2-Lite style)
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-6
    max_seq_len: int = 4096
    dtype: Any = jnp.bfloat16
    # DeepSeek-MoE (V2): softmax-scored routed experts + always-on shared
    # experts; layers < first_k_dense keep the dense MLP
    n_experts: int = 0                  # 0 = dense MLP everywhere
    moe_top_k: int = 6
    moe_d_ff: int = 0                   # routed-expert hidden size
    n_shared_experts: int = 0           # shared MLP hidden = n * moe_d_ff
    first_k_dense: int = 1
    routed_scaling: float = 1.0
    norm_topk_prob: bool = False
    # DeepSeek-V2/V2-Chat device-limited routing: experts are split into
    # n_group groups; only the topk_group groups with the highest per-group
    # max score stay eligible before the expert top-k
    # (HF DeepseekV2MoEGate topk_method="group_limited_greedy")
    topk_method: str = "greedy"
    n_group: int = 1
    topk_group: int = 1
    # expert-parallel mesh axis (inside shard_map): each device holds
    # E/ep whole routed experts (stack leading dim sharded); the psum in
    # _mlp completes token outputs.  Shared experts stay replicated.
    ep_axis: Optional[str] = None
    yarn: Optional[YarnParams] = None
    kv_bits: int = 8  # latent-cache code width: 8 (default) or 4

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def moe_layer(self, li: int) -> bool:
        return self.n_experts > 0 and li >= self.first_k_dense

    @staticmethod
    def tiny(vocab: int = 256, **kw) -> "MLAConfig":
        return MLAConfig(
            vocab_size=vocab, d_model=128, n_layers=2, n_heads=4, d_ff=256,
            kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=8,
            v_head_dim=16, max_seq_len=128, **kw)

    @staticmethod
    def tiny_moe(vocab: int = 256, **kw) -> "MLAConfig":
        """Tiny DeepSeek-V2 geometry: MoE-MLA + yarn (full V2 feature set)."""
        kw.setdefault("yarn", YarnParams(
            factor=4.0, original_max_position_embeddings=32,
            mscale=0.707, mscale_all_dim=0.707))
        return MLAConfig.tiny(
            vocab=vocab, n_experts=4, moe_top_k=2, moe_d_ff=96,
            n_shared_experts=2, first_k_dense=1, routed_scaling=1.0,
            norm_topk_prob=False, **kw)


# ---------------------------------------------------------------------------
# latent cache: INT8 c + bf16 rope key
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LatentKVCache:
    """Stacked per-layer latent cache.

    c_codes: [L, B, S, R] int8 — per-token symmetric INT8 of the
             post-layernorm compressed kv latent;
    c_scale: [L, B, S, 1] f32;
    k_pe:    [L, B, S, rope_dim] bf16 (post-rope, shared across heads —
             small enough that quantizing it isn't worth the error);
    length:  [B] int32 live positions.
    """

    c_codes: Array
    c_scale: Array
    k_pe: Array
    length: Array

    def tree_flatten(self):
        return (self.c_codes, self.c_scale, self.k_pe, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.c_codes.shape[2]


def init_latent_cache(cfg: MLAConfig, batch: int, max_len: int) -> LatentKVCache:
    # kv4 latent codes are nibble-packed uint8 [..., R/2] (pack4 in
    # quant/kv_cache.py — native jnp.int4 cannot cross a jit boundary on
    # the axon backend, and explicit packing guarantees the byte layout)
    if cfg.kv_bits == 4 and cfg.kv_lora_rank % 2:
        # pack4's split-half layout pairs code j with code j + R/2; an odd
        # rank would silently truncate the packed shape (same check as
        # llama.init_kv_cache's even-head_dim requirement)
        raise ValueError(
            f"kv_bits=4 needs an even kv_lora_rank, got {cfg.kv_lora_rank}")
    cdt = jnp.uint8 if cfg.kv_bits == 4 else jnp.int8
    cr = cfg.kv_lora_rank // 2 if cfg.kv_bits == 4 else cfg.kv_lora_rank
    return LatentKVCache(
        c_codes=jnp.zeros((cfg.n_layers, batch, max_len, cr), cdt),
        c_scale=jnp.ones((cfg.n_layers, batch, max_len, 1), jnp.float32),
        k_pe=jnp.zeros((cfg.n_layers, batch, max_len, cfg.qk_rope_head_dim),
                       jnp.bfloat16),
        # [L, B] (stacked copies): batch at axis 1 on every leaf is the
        # serving engine's slot-surgery convention
        length=jnp.zeros((cfg.n_layers, batch), jnp.int32),
    )


def _quantize_latent(c: Array, bits: int = 8) -> Tuple[Array, Array]:
    """Per-token symmetric INT8/INT4 (same scheme as quant/kv_cache.py;
    bits=4 halves the latent-cache bytes on top of MLA's compression and
    returns nibble-packed uint8 [..., R/2])."""
    from piquant_tpu.quant.kv_cache import pack4

    qmax = 127.0 if bits == 8 else 7.0
    cf = c.astype(jnp.float32)
    amax = jnp.max(jnp.abs(cf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    codes = jnp.clip(jnp.round(cf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        return pack4(codes), scale
    return codes, scale


def _codes_bf16(cc: Array, bits: int) -> Array:
    """Cache codes -> bf16 operand (unpacks the kv4 nibble layout)."""
    if bits == 4:
        from piquant_tpu.quant.kv_cache import unpack4

        cc = unpack4(cc)
    return cc.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_params(cfg: MLAConfig, key: Array) -> Dict:
    keys = iter(jax.random.split(
        key, 4 + cfg.n_layers * (10 + 3 * max(cfg.n_experts, 1) + 4)))
    dt = cfg.dtype

    def dense(k, din, dout, std=0.02):
        return (jax.random.normal(k, (din, dout), jnp.float32) * std).astype(dt)

    params: Dict[str, Any] = {
        "embed": dense(next(keys), cfg.vocab_size, cfg.d_model),
        "final_norm": jnp.ones((cfg.d_model,), dt),
        "lm_head": dense(next(keys), cfg.d_model, cfg.vocab_size),
        "layers": [],
    }
    h, qk = cfg.n_heads, cfg.qk_head_dim
    for li in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), dt),
            "mlp_norm": jnp.ones((cfg.d_model,), dt),
            "kv_a": dense(next(keys), cfg.d_model,
                          cfg.kv_lora_rank + cfg.qk_rope_head_dim),
            "kv_a_norm": jnp.ones((cfg.kv_lora_rank,), dt),
            "kv_b": dense(next(keys), cfg.kv_lora_rank,
                          h * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
            "wo": dense(next(keys), h * cfg.v_head_dim, cfg.d_model),
        }
        if cfg.moe_layer(li):
            e, dff = cfg.n_experts, cfg.moe_d_ff
            layer["router"] = dense(next(keys), cfg.d_model, e)
            if cfg.topk_method == "noaux_tc":
                layer["router_bias"] = jnp.zeros((e,), jnp.float32)
            layer["moe_w1"] = jnp.stack(
                [dense(next(keys), cfg.d_model, dff) for _ in range(e)])
            layer["moe_w3"] = jnp.stack(
                [dense(next(keys), cfg.d_model, dff) for _ in range(e)])
            layer["moe_w2"] = jnp.stack(
                [dense(next(keys), dff, cfg.d_model) for _ in range(e)])
            if cfg.n_shared_experts:
                sh = cfg.n_shared_experts * dff
                layer["shared_w1"] = dense(next(keys), cfg.d_model, sh)
                layer["shared_w3"] = dense(next(keys), cfg.d_model, sh)
                layer["shared_w2"] = dense(next(keys), sh, cfg.d_model)
        else:
            layer["w1"] = dense(next(keys), cfg.d_model, cfg.d_ff)
            layer["w3"] = dense(next(keys), cfg.d_model, cfg.d_ff)
            layer["w2"] = dense(next(keys), cfg.d_ff, cfg.d_model)
        if cfg.q_lora_rank is None:
            layer["wq"] = dense(next(keys), cfg.d_model, h * qk)
        else:
            layer["wq_a"] = dense(next(keys), cfg.d_model, cfg.q_lora_rank)
            layer["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dt)
            layer["wq_b"] = dense(next(keys), cfg.q_lora_rank, h * qk)
        params["layers"].append(layer)
    return params


_MLA_QUANT_KEYS = ("wq", "wq_a", "wq_b", "kv_a", "kv_b", "wo",
                   "w1", "w2", "w3", "shared_w1", "shared_w2", "shared_w3")
_MLA_QUANT_STACKS = ("moe_w1", "moe_w2", "moe_w3")


def quantize_params(params: Dict, bits: int = 4, *,
                    group_size: Optional[int] = None) -> Dict:
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for k in _MLA_QUANT_KEYS:
            if k in layer:
                ql[k] = quantize_linear_weight(layer[k], bits,
                                               group_size=group_size)
        for k in _MLA_QUANT_STACKS:
            if k in layer:
                ql[k] = QuantizedExpertStack.stack(
                    [quantize_linear_weight(w, bits, group_size=group_size)
                     for w in layer[k]])
        out["layers"].append(ql)
    return out


def _mm(x, w, out_dtype):
    if type(w).__name__ == "LoraLinear":   # quant/lora.py (lazy: no cycle)
        y = _mm(x, w.base, out_dtype)
        delta = (x.astype(jnp.float32) @ w.a.astype(jnp.float32)
                 ) @ w.b.astype(jnp.float32) * w.scaling
        return (y.astype(jnp.float32) + delta).astype(out_dtype)
    if type(w).__name__ == "MultiLoraLinear":
        # per-batch-row adapter — same math as llama._mm (multi-tenant
        # LoRA over the MLA projections)
        y = _mm(x, w.base, out_dtype)
        a_sel = w.a[w.ids].astype(jnp.float32)
        b_sel = w.b[w.ids].astype(jnp.float32)
        s_sel = w.scaling[w.ids].reshape(
            (w.ids.shape[0],) + (1,) * (x.ndim - 1))
        d1 = jnp.einsum("b...k,bkr->b...r", x.astype(jnp.float32), a_sel)
        delta = jnp.einsum("b...r,brn->b...n", d1, b_sel) * s_sel
        return (y.astype(jnp.float32) + delta).astype(out_dtype)
    if isinstance(w, QuantizedLinear):
        return quantized_matmul(x, w, out_dtype)
    return jnp.dot(x.astype(out_dtype), w.astype(out_dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def _w_dense(w) -> Array:
    """kv_b must be split per head for absorption: materialize if quantized
    (R x H*(nope+v) is small — e.g. 512 x 32k bf16 = 32 MB for V2)."""
    return w.dequantize(jnp.bfloat16) if isinstance(w, QuantizedLinear) else w


def _yarn_inv_freq(cfg: MLAConfig):
    """YaRN inverse frequencies + attention factor (transformers
    modeling_rope_utils._compute_yarn_parameters, re-derived)."""
    import math

    y = cfg.yarn
    rd = cfg.qk_rope_head_dim
    base = cfg.rope_theta
    pos_freqs = base ** (jnp.arange(0, rd, 2, jnp.float32) / rd)
    inv_extra = 1.0 / pos_freqs
    inv_inter = 1.0 / (y.factor * pos_freqs)

    def corr_dim(n_rot):
        return (rd * math.log(y.original_max_position_embeddings
                              / (n_rot * 2 * math.pi))) / (2 * math.log(base))

    low = max(math.floor(corr_dim(y.beta_fast)), 0)
    high = min(math.ceil(corr_dim(y.beta_slow)), rd - 1)
    ramp = jnp.clip(
        (jnp.arange(rd // 2, dtype=jnp.float32) - low) / max(high - low, 1e-3),
        0.0, 1.0)
    extra_factor = 1.0 - ramp
    inv = inv_inter * (1.0 - extra_factor) + inv_extra * extra_factor

    def get_mscale(scale, m=1.0):
        return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

    if y.mscale and y.mscale_all_dim:
        att = get_mscale(y.factor, y.mscale) / get_mscale(y.factor,
                                                          y.mscale_all_dim)
    else:
        att = get_mscale(y.factor)
    return inv, float(att)


def _rope(cfg: MLAConfig, positions: Array):
    rd = cfg.qk_rope_head_dim
    if cfg.yarn is not None:
        inv, att = _yarn_inv_freq(cfg)
    else:
        inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, rd, 2, jnp.float32) / rd))
        att = 1.0
    ang = positions[..., None].astype(jnp.float32) * inv
    # yarn attention factor scales cos AND sin (HF multiplies freqs_cis)
    return jnp.cos(ang) * att, jnp.sin(ang) * att


def _project_q(cfg: MLAConfig, layer: Dict, x: Array, cos, sin):
    """x [B,T,D] -> q_nope [B,H,T,nope], q_pe [B,H,T,rope] (post-rope)."""
    b, t, _ = x.shape
    dt = cfg.dtype
    if "wq" in layer:
        q = _mm(x, layer["wq"], dt)
    else:
        qa = rms_norm(_mm(x, layer["wq_a"], dt), layer["q_a_norm"], cfg.rms_eps)
        q = _mm(qa, layer["wq_b"], dt)
    q = q.reshape(b, t, cfg.n_heads, cfg.qk_head_dim).transpose(0, 2, 1, 3)
    q_nope = q[..., :cfg.qk_nope_head_dim]
    q_pe = apply_rope(q[..., cfg.qk_nope_head_dim:], cos, sin)
    return q_nope, q_pe


def _project_latent(cfg: MLAConfig, layer: Dict, x: Array, cos, sin):
    """x [B,T,D] -> c [B,T,R] (post-norm latent), k_pe [B,T,rope] post-rope."""
    ckv = _mm(x, layer["kv_a"], cfg.dtype)
    c = rms_norm(ckv[..., :cfg.kv_lora_rank], layer["kv_a_norm"], cfg.rms_eps)
    k_pe = ckv[..., cfg.kv_lora_rank:]
    # shared rope key: one "head" -> [B,1,T,rope] for apply_rope
    k_pe = apply_rope(k_pe[:, None], cos, sin)[:, 0]
    return c, k_pe


def _split_kv_b(cfg: MLAConfig, layer: Dict):
    """kv_b [R, H*(nope+v)] -> W_k [R,H,nope], W_v [R,H,v]."""
    wb = _w_dense(layer["kv_b"]).reshape(
        cfg.kv_lora_rank, cfg.n_heads, cfg.qk_nope_head_dim + cfg.v_head_dim)
    return wb[..., :cfg.qk_nope_head_dim], wb[..., cfg.qk_nope_head_dim:]


def _silu_mlp(cfg: MLAConfig, w1, w3, w2, x: Array) -> Array:
    dt = cfg.dtype
    g = _mm(x, w1, dt)
    u = _mm(x, w3, dt)
    return _mm((jax.nn.silu(g.astype(jnp.float32))
                * u.astype(jnp.float32)).astype(dt), w2, dt)


def _mlp(cfg: MLAConfig, layer: Dict, x: Array) -> Array:
    """Dense MLP or DeepSeek-MoE (HF DeepseekV2MoE semantics: softmax
    scores -> greedy top-k -> optional renorm -> routed_scaling; shared
    experts are an always-on ungated MLP added to the routed sum)."""
    if "router" not in layer:
        return _silu_mlp(cfg, layer["w1"], layer["w3"], layer["w2"], x)
    dt = cfg.dtype
    logits = jnp.einsum("btd,de->bte", x.astype(jnp.float32),
                        layer["router"].astype(jnp.float32))
    bsz, t, e = logits.shape
    if cfg.n_group > 1 and e % cfg.n_group:
        raise ValueError(f"n_experts={e} not divisible by "
                         f"n_group={cfg.n_group}")
    per = e // cfg.n_group

    def group_limit(choice, group_score):
        """Zero out experts outside the topk_group best groups
        (HF masked_fill(~mask, 0.0) semantics)."""
        _, gi = jax.lax.top_k(group_score, cfg.topk_group)   # [B,T,Kg]
        gmask = jnp.sum(jax.nn.one_hot(gi, cfg.n_group, dtype=choice.dtype),
                        axis=-2)                              # [B,T,G]
        return jnp.where(jnp.repeat(gmask, per, axis=-1) > 0, choice, 0.0)

    if cfg.topk_method == "noaux_tc":
        # DeepSeek-V3 router (HF DeepseekV3TopkRouter): sigmoid scores; a
        # selection-only correction bias; group score = sum of the top-2
        # biased scores per group; weights gathered from the UNBIASED
        # sigmoid scores at the selected experts.
        scores = jax.nn.sigmoid(logits)
        choice = scores + layer["router_bias"].astype(jnp.float32)[None, None]
        if cfg.n_group > 1:
            grp = choice.reshape(bsz, t, cfg.n_group, per)
            gscore = jnp.sum(jax.lax.top_k(grp, 2)[0], axis=-1)
            choice = group_limit(choice, gscore)
        _, topi = jax.lax.top_k(choice, cfg.moe_top_k)
        probs = jnp.take_along_axis(scores, topi, axis=-1)
        if cfg.norm_topk_prob:
            probs = probs / (jnp.sum(probs, axis=-1, keepdims=True) + 1e-20)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        if cfg.topk_method == "group_limited_greedy" and cfg.n_group > 1:
            # V2/V2-Chat device-limited routing: group score = per-group max
            # (scores >= 0, so where(...) == HF's masked_fill to 0.0)
            gmax = jnp.max(scores.reshape(bsz, t, cfg.n_group, per), axis=-1)
            scores = group_limit(scores, gmax)
        probs, topi = jax.lax.top_k(scores, cfg.moe_top_k)
        if cfg.norm_topk_prob:
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs * cfg.routed_scaling

    def as_linear(st):
        # scan slices the stack pytree's leading (expert) axis; rebuild a
        # 2-D view (cf. llama._moe_dense)
        if hasattr(st, "bits"):
            return QuantizedLinear(data=st.data, scale=st.scale,
                                   zero_point=st.zero_point, bits=st.bits,
                                   k=st.k, group_size=st.group_size,
                                   s_chunk=getattr(st, "s_chunk", None),
                                   z_chunk=getattr(st, "z_chunk", None),
                                   codebook=getattr(st, "codebook", None))
        return st

    w1s = layer["moe_w1"]
    e_local = w1s.n_experts if hasattr(w1s, "n_experts") else w1s.shape[0]
    off = (jax.lax.axis_index(cfg.ep_axis) * e_local
           if cfg.ep_axis is not None else 0)

    def body(y, per):
        el, e1, e3, e2 = per
        gate = jnp.sum(jnp.where(topi == off + el, probs, 0.0),
                       axis=-1, keepdims=True)
        h = _silu_mlp(cfg, as_linear(e1), as_linear(e3), as_linear(e2), x)
        return y + h.astype(jnp.float32) * gate, None

    y0 = jnp.zeros(x.shape, jnp.float32)
    if cfg.ep_axis is not None:
        # the body output varies over ep (gate uses axis_index); the carry
        # must carry the same vma type under shard_map
        y0 = jax.lax.pvary(y0, (cfg.ep_axis,))
    y, _ = jax.lax.scan(
        body, y0,
        (jnp.arange(e_local, dtype=jnp.int32),
         w1s, layer["moe_w3"], layer["moe_w2"]))
    if cfg.ep_axis is not None:
        y = jax.lax.psum(y, cfg.ep_axis)
    if "shared_w1" in layer:
        y = y + _silu_mlp(cfg, layer["shared_w1"], layer["shared_w3"],
                          layer["shared_w2"], x).astype(jnp.float32)
    return y.astype(dt)


def forward(
    cfg: MLAConfig,
    params: Dict,
    tokens: Array,                       # [B, T] int32
    positions: Optional[Array] = None,
    cache: Optional[LatentKVCache] = None,  # filled (not read) when given
    logit_positions: Optional[Array] = None,  # [B]: lm_head only there
) -> Tuple[Array, Optional[LatentKVCache]]:
    """Full forward (prefill): materialized per-head K/V attention, exactly
    the HF DeepseekV2 data flow; optionally writes the latent cache."""
    b, t = tokens.shape
    dt = cfg.dtype
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    x = params["embed"][tokens].astype(dt)
    cos, sin = _rope(cfg, positions)
    mask = jnp.where(
        jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -1e9
    )[None, None].astype(jnp.float32)
    scale = cfg.qk_head_dim ** -0.5

    for li, layer in enumerate(params["layers"]):
        hx = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q_nope, q_pe = _project_q(cfg, layer, hx, cos, sin)
        c, k_pe = _project_latent(cfg, layer, hx, cos, sin)
        w_k, w_v = _split_kv_b(cfg, layer)
        # materialized per-head K/V (prefill is MXU-bound; absorption is a
        # decode-bandwidth optimization)
        k_nope = jnp.einsum("btr,rhn->bhtn", c.astype(jnp.bfloat16), w_k,
                            preferred_element_type=jnp.float32).astype(dt)
        v = jnp.einsum("btr,rhv->bhtv", c.astype(jnp.bfloat16), w_v,
                       preferred_element_type=jnp.float32).astype(dt)
        scores = (
            jnp.einsum("bhtn,bhsn->bhts", q_nope.astype(jnp.bfloat16),
                       k_nope.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhtr,bsr->bhts", q_pe.astype(jnp.bfloat16),
                         k_pe.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        ) * scale + mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhts,bhsv->bhtv", probs.astype(jnp.bfloat16), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(dt).transpose(0, 2, 1, 3).reshape(
            b, t, cfg.n_heads * cfg.v_head_dim)
        x = x + _mm(ctx, layer["wo"], dt)

        x = x + _mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.rms_eps))

        if cache is not None:
            codes, cscale = _quantize_latent(c, cfg.kv_bits)
            cache = LatentKVCache(
                c_codes=jax.lax.dynamic_update_slice(
                    cache.c_codes, codes[None], (li, 0, 0, 0)),
                c_scale=jax.lax.dynamic_update_slice(
                    cache.c_scale, cscale[None], (li, 0, 0, 0)),
                k_pe=jax.lax.dynamic_update_slice(
                    cache.k_pe, k_pe.astype(jnp.bfloat16)[None], (li, 0, 0, 0)),
                length=cache.length,
            )

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if logit_positions is not None:
        # project lm_head only at the requested positions ([B, T, V] full
        # logits would dominate prefill memory at LLM vocab sizes)
        x = jnp.take_along_axis(
            x, logit_positions[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = _mm(x, params["lm_head"], jnp.float32)
    if cache is not None:
        cache = LatentKVCache(cache.c_codes, cache.c_scale, cache.k_pe,
                              cache.length + t)
    return logits, cache


def prefill(cfg: MLAConfig, params: Dict, tokens: Array,
            cache: LatentKVCache,
            last_positions: Optional[Array] = None
            ) -> Tuple[Array, LatentKVCache]:
    """Engine-compatible prefill: fills the latent cache, returns logits
    [B, V] at `last_positions` (default: final position)."""
    b, t = tokens.shape
    if last_positions is None:
        last_positions = jnp.full((b,), t - 1, jnp.int32)
    return forward(cfg, params, tokens, cache=cache,
                   logit_positions=last_positions)


def init_kv_cache(cfg: MLAConfig, batch: int,
                  max_len: Optional[int] = None) -> LatentKVCache:
    return init_latent_cache(cfg, batch, max_len or cfg.max_seq_len)


def forward_chunk(
    cfg: MLAConfig,
    params: Dict,
    tokens: Array,            # [B, T] int32
    positions: Array,         # [B, T] absolute
    cache: LatentKVCache,
    last_positions: Array,    # [B] in-chunk index for the returned logits
    kv_write_start,           # scalar: chunk writes [start, start+T)
    attn_window: Optional[int] = None,
) -> Tuple[Array, LatentKVCache]:
    """Chunked prefill through the ABSORBED path (engine
    prefill/decode interleaving, same contract as llama.forward with
    kv_write_start): the chunk's latents are written at
    [start, start+T) and attention reads the INT8 latent cache —
    in-chunk self-attention therefore sees its own QUANTIZED latents,
    the same int8-readback tolerance class as the dense-KV chunked path.
    Returns (logits [B, V] at last_positions, cache)."""
    b, t = tokens.shape
    dt = cfg.dtype
    x = params["embed"][tokens].astype(dt)
    cos, sin = _rope(cfg, positions)
    w = attn_window or cache.max_len
    kv_pos = jnp.arange(w, dtype=jnp.int32)
    mask = jnp.where(
        kv_pos[None, None, None, :] <= positions[:, None, :, None], 0.0, -1e9
    ).astype(jnp.float32)                               # [B,1,T,w]
    scale = cfg.qk_head_dim ** -0.5
    st = jnp.asarray(kv_write_start, jnp.int32).reshape(())

    for li, layer in enumerate(params["layers"]):
        hx = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q_nope, q_pe = _project_q(cfg, layer, hx, cos, sin)      # [B,H,T,*]
        c_new, kpe_new = _project_latent(cfg, layer, hx, cos, sin)  # [B,T,*]
        codes, cscale = _quantize_latent(c_new, cfg.kv_bits)

        def dus(buf, upd):
            return jax.lax.dynamic_update_slice(
                buf, upd[None].astype(buf.dtype),
                (jnp.int32(li), jnp.int32(0), st, jnp.int32(0)))

        cache = LatentKVCache(
            c_codes=dus(cache.c_codes, codes),
            c_scale=dus(cache.c_scale, cscale),
            k_pe=dus(cache.k_pe, kpe_new),
            length=cache.length,
        )

        w_k, w_v = _split_kv_b(cfg, layer)
        q_lat = jnp.einsum("bhtn,rhn->bhtr", q_nope.astype(jnp.bfloat16),
                           w_k, preferred_element_type=jnp.float32)
        cc = _codes_bf16(cache.c_codes[li, :, :w], cfg.kv_bits)  # [B,w,R]
        cs = cache.c_scale[li, :, :w, 0]                         # [B,w]
        scores = (
            jnp.einsum("bhtr,bsr->bhts", q_lat.astype(jnp.bfloat16), cc,
                       preferred_element_type=jnp.float32)
            * cs[:, None, None]
            + jnp.einsum("bhtr,bsr->bhts", q_pe.astype(jnp.bfloat16),
                         cache.k_pe[li, :, :w],
                         preferred_element_type=jnp.float32)
        ) * scale + mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_lat = jnp.einsum("bhts,bsr->bhtr",
                             (probs * cs[:, None, None]).astype(jnp.bfloat16),
                             cc, preferred_element_type=jnp.float32)
        ctx = jnp.einsum("bhtr,rhv->bhtv", ctx_lat.astype(jnp.bfloat16), w_v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(dt).transpose(0, 2, 1, 3).reshape(
            b, t, cfg.n_heads * cfg.v_head_dim)
        x = x + _mm(ctx, layer["wo"], dt)

        x = x + _mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.rms_eps))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    x = jnp.take_along_axis(
        x, last_positions[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = _mm(x, params["lm_head"], jnp.float32)
    cache = LatentKVCache(cache.c_codes, cache.c_scale, cache.k_pe,
                          jnp.maximum(cache.length, st + t))
    return logits, cache


def decode_step(
    cfg: MLAConfig,
    params: Dict,
    token: Array,      # [B] int32
    position: Array,   # [B] int32
    cache: LatentKVCache,
    attn_window: Optional[int] = None,  # static: read only cache[:window]
) -> Tuple[Array, LatentKVCache]:
    """One decode step through the ABSORBED path: attention reads only the
    INT8 latent cache (R + rope_dim per position), never per-head K/V."""
    b = token.shape[0]
    dt = cfg.dtype
    x = params["embed"][token][:, None].astype(dt)      # [B,1,D]
    cos, sin = _rope(cfg, position[:, None])
    s_max = min(cache.max_len, attn_window) if attn_window else cache.max_len
    kv_pos = jnp.arange(s_max, dtype=jnp.int32)[None]
    scale = cfg.qk_head_dim ** -0.5

    for li, layer in enumerate(params["layers"]):
        hx = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q_nope, q_pe = _project_q(cfg, layer, hx, cos, sin)   # [B,H,1,*]
        c_new, kpe_new = _project_latent(cfg, layer, hx, cos, sin)  # [B,1,*]

        # append current position to the latent cache
        codes, cscale = _quantize_latent(c_new, cfg.kv_bits)

        def put(buf, upd):
            return jax.vmap(
                lambda bf, up, p: jax.lax.dynamic_update_slice(
                    bf, up.astype(bf.dtype), (p, jnp.zeros((), p.dtype)))
            )(buf, upd, position)

        cache = LatentKVCache(
            c_codes=cache.c_codes.at[li].set(put(cache.c_codes[li], codes)),
            c_scale=cache.c_scale.at[li].set(put(cache.c_scale[li], cscale)),
            k_pe=cache.k_pe.at[li].set(put(cache.k_pe[li], kpe_new)),
            length=cache.length,
        )

        w_k, w_v = _split_kv_b(cfg, layer)
        # score side: q into latent space, one dot against the INT8 cache
        q_lat = jnp.einsum("bhn,rhn->bhr", q_nope[:, :, 0].astype(jnp.bfloat16),
                           w_k, preferred_element_type=jnp.float32)
        cc = _codes_bf16(cache.c_codes[li, :, :s_max], cfg.kv_bits)  # [B,S,R]
        cs = cache.c_scale[li, :, :s_max, 0]                    # [B,S]
        scores_lat = jnp.einsum("bhr,bsr->bhs", q_lat.astype(jnp.bfloat16), cc,
                                preferred_element_type=jnp.float32) * cs[:, None]
        scores_pe = jnp.einsum("bhr,bsr->bhs",
                               q_pe[:, :, 0].astype(jnp.bfloat16),
                               cache.k_pe[li, :, :s_max],
                               preferred_element_type=jnp.float32)
        mask = jnp.where(kv_pos <= position[:, None], 0.0, -1e9)[:, None]
        probs = jax.nn.softmax((scores_lat + scores_pe) * scale + mask, -1)
        # output side: context in latent space, then absorb W_v
        ctx_lat = jnp.einsum("bhs,bsr->bhr",
                             (probs * cs[:, None]).astype(jnp.bfloat16), cc,
                             preferred_element_type=jnp.float32)
        ctx = jnp.einsum("bhr,rhv->bhv", ctx_lat.astype(jnp.bfloat16), w_v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(dt).reshape(b, 1, cfg.n_heads * cfg.v_head_dim)
        x = x + _mm(ctx, layer["wo"], dt)

        x = x + _mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.rms_eps))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _mm(x[:, 0], params["lm_head"], jnp.float32)
    return logits, LatentKVCache(cache.c_codes, cache.c_scale, cache.k_pe,
                                 cache.length + 1)


def forward_verify(
    cfg: MLAConfig,
    params: Dict,
    tokens: Array,       # [B, T] int32
    positions: Array,    # [B, T] absolute, row-contiguous (p, p+1, ..)
    cache: LatentKVCache,
    attn_window: Optional[int] = None,
) -> Tuple[Array, LatentKVCache]:
    """Multi-token cached forward for speculative verification.

    The absorbed-path analogue of llama.forward(tokens[B,T], positions,
    cache): each row's T latents are written at
    [positions[b,0], positions[b,0]+T) (per-row start — rows advance
    independently under continuous batching), attention reads the INT8
    latent cache with per-position causal masks (an in-chunk query sees
    in-chunk keys through their QUANTIZED latents — the same numerics
    class as decode_step, which also reads its own token back from the
    cache), and FULL logits [B, T, V] are returned so the caller can
    verify every drafted position.  Rejected-draft garbage beyond a row's
    continuation point stays masked until overwritten, exactly like the
    dense-KV path (models/speculative.py invariant)."""
    b, t = tokens.shape
    dt = cfg.dtype
    x = params["embed"][tokens].astype(dt)
    cos, sin = _rope(cfg, positions)
    w = min(cache.max_len, attn_window) if attn_window else cache.max_len
    kv_pos = jnp.arange(w, dtype=jnp.int32)
    mask = jnp.where(
        kv_pos[None, None, None, :] <= positions[:, None, :, None], 0.0, -1e9
    ).astype(jnp.float32)                               # [B,1,T,w]
    scale = cfg.qk_head_dim ** -0.5
    start = positions[:, 0]

    for li, layer in enumerate(params["layers"]):
        hx = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q_nope, q_pe = _project_q(cfg, layer, hx, cos, sin)      # [B,H,T,*]
        c_new, kpe_new = _project_latent(cfg, layer, hx, cos, sin)  # [B,T,*]
        codes, cscale = _quantize_latent(c_new, cfg.kv_bits)

        def put(buf, upd):
            return jax.vmap(
                lambda bf, up, p: jax.lax.dynamic_update_slice(
                    bf, up.astype(bf.dtype), (p, jnp.zeros((), p.dtype)))
            )(buf, upd, start)

        cache = LatentKVCache(
            c_codes=cache.c_codes.at[li].set(put(cache.c_codes[li], codes)),
            c_scale=cache.c_scale.at[li].set(put(cache.c_scale[li], cscale)),
            k_pe=cache.k_pe.at[li].set(put(cache.k_pe[li], kpe_new)),
            length=cache.length,
        )

        w_k, w_v = _split_kv_b(cfg, layer)
        q_lat = jnp.einsum("bhtn,rhn->bhtr", q_nope.astype(jnp.bfloat16),
                           w_k, preferred_element_type=jnp.float32)
        cc = _codes_bf16(cache.c_codes[li, :, :w], cfg.kv_bits)  # [B,w,R]
        cs = cache.c_scale[li, :, :w, 0]                         # [B,w]
        scores = (
            jnp.einsum("bhtr,bsr->bhts", q_lat.astype(jnp.bfloat16), cc,
                       preferred_element_type=jnp.float32)
            * cs[:, None, None]
            + jnp.einsum("bhtr,bsr->bhts", q_pe.astype(jnp.bfloat16),
                         cache.k_pe[li, :, :w],
                         preferred_element_type=jnp.float32)
        ) * scale + mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_lat = jnp.einsum("bhts,bsr->bhtr",
                             (probs * cs[:, None, None]).astype(jnp.bfloat16),
                             cc, preferred_element_type=jnp.float32)
        ctx = jnp.einsum("bhtr,rhv->bhtv", ctx_lat.astype(jnp.bfloat16), w_v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(dt).transpose(0, 2, 1, 3).reshape(
            b, t, cfg.n_heads * cfg.v_head_dim)
        x = x + _mm(ctx, layer["wo"], dt)

        x = x + _mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.rms_eps))

    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    logits = _mm(x, params["lm_head"], jnp.float32)
    return logits, LatentKVCache(
        cache.c_codes, cache.c_scale, cache.k_pe,
        jnp.maximum(cache.length, positions[None, :, -1] + 1))


# ---------------------------------------------------------------------------
# HF loader (DeepseekV2ForCausalLM)
# ---------------------------------------------------------------------------

def config_from_hf(hf_config: Any, dtype=jnp.bfloat16) -> MLAConfig:
    n_experts = getattr(hf_config, "n_routed_experts", None) or 0
    yarn = None
    rs = getattr(hf_config, "rope_scaling", None)
    if rs:
        rtype = rs.get("rope_type", rs.get("type"))
        if rtype != "yarn":
            raise ValueError(f"unsupported rope scaling {rtype!r} (yarn only)")
        yarn = YarnParams(
            factor=rs["factor"],
            original_max_position_embeddings=rs.get(
                "original_max_position_embeddings",
                hf_config.max_position_embeddings),
            beta_fast=rs.get("beta_fast") or 32.0,
            beta_slow=rs.get("beta_slow") or 1.0,
            mscale=rs.get("mscale") or 1.0,
            mscale_all_dim=rs.get("mscale_all_dim") or 0.0,
        )
    if getattr(hf_config, "model_type", "") == "deepseek_v3":
        # V3 has no topk_method field; its router is always the sigmoid
        # noaux_tc scheme (HF DeepseekV3TopkRouter)
        topk_method = "noaux_tc"
    else:
        topk_method = getattr(hf_config, "topk_method", "greedy") or "greedy"
    if n_experts and topk_method not in ("greedy", "group_limited_greedy",
                                         "noaux_tc"):
        raise ValueError(f"unsupported topk_method {topk_method!r}")
    return MLAConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        d_ff=hf_config.intermediate_size,
        kv_lora_rank=hf_config.kv_lora_rank,
        q_lora_rank=getattr(hf_config, "q_lora_rank", None),
        qk_nope_head_dim=hf_config.qk_nope_head_dim,
        qk_rope_head_dim=hf_config.qk_rope_head_dim,
        v_head_dim=hf_config.v_head_dim,
        rope_theta=getattr(hf_config, "rope_theta", 10_000.0),
        rms_eps=getattr(hf_config, "rms_norm_eps", 1e-6),
        max_seq_len=getattr(hf_config, "max_position_embeddings", 4096),
        dtype=dtype,
        n_experts=n_experts,
        moe_top_k=getattr(hf_config, "num_experts_per_tok", None) or 6,
        moe_d_ff=getattr(hf_config, "moe_intermediate_size", 0) or 0,
        n_shared_experts=getattr(hf_config, "n_shared_experts", None) or 0,
        first_k_dense=getattr(hf_config, "first_k_dense_replace", 0) or 0,
        routed_scaling=getattr(hf_config, "routed_scaling_factor", 1.0),
        norm_topk_prob=bool(getattr(hf_config, "norm_topk_prob", False)),
        topk_method=topk_method,
        n_group=getattr(hf_config, "n_group", None) or 1,
        topk_group=getattr(hf_config, "topk_group", None) or 1,
        yarn=yarn,
    )


def params_from_hf(model, dtype=jnp.bfloat16) -> Tuple[MLAConfig, Dict]:
    """transformers DeepseekV2ForCausalLM (dense-MLP layers) -> pytree.
    No rope column permutation: this family's rope is natively interleaved
    (complex multiply), matching apply_rope."""
    import numpy as np

    cfg = config_from_hf(model.config, dtype)
    sd = model.state_dict()

    def npy(name):
        t = sd[name].detach().to("cpu")
        if t.dtype not in (getattr(__import__("torch"), "float32"),
                           getattr(__import__("torch"), "float64")):
            t = t.float()
        return np.asarray(t.numpy())

    def lin(name):
        return npy(name).T

    dt = dtype
    params: Dict[str, Any] = {
        "embed": jnp.asarray(npy("model.embed_tokens.weight"), dt),
        "final_norm": jnp.asarray(npy("model.norm.weight"), dt),
        "lm_head": jnp.asarray(
            lin("lm_head.weight") if "lm_head.weight" in sd
            else npy("model.embed_tokens.weight").T, dt),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        layer = {
            "attn_norm": jnp.asarray(npy(pre + "input_layernorm.weight"), dt),
            "mlp_norm": jnp.asarray(
                npy(pre + "post_attention_layernorm.weight"), dt),
            "kv_a": jnp.asarray(lin(pre + "self_attn.kv_a_proj_with_mqa.weight"), dt),
            "kv_a_norm": jnp.asarray(npy(pre + "self_attn.kv_a_layernorm.weight"), dt),
            "kv_b": jnp.asarray(lin(pre + "self_attn.kv_b_proj.weight"), dt),
            "wo": jnp.asarray(lin(pre + "self_attn.o_proj.weight"), dt),
        }
        if cfg.moe_layer(i):
            layer["router"] = jnp.asarray(lin(pre + "mlp.gate.weight"), dt)
            if pre + "mlp.gate.e_score_correction_bias" in sd:
                layer["router_bias"] = jnp.asarray(
                    npy(pre + "mlp.gate.e_score_correction_bias"), jnp.float32)
            elif cfg.topk_method == "noaux_tc":
                layer["router_bias"] = jnp.zeros((cfg.n_experts,), jnp.float32)
            for ours, theirs in (("moe_w1", "gate_proj"), ("moe_w3", "up_proj"),
                                 ("moe_w2", "down_proj")):
                layer[ours] = jnp.asarray(np.stack(
                    [lin(pre + f"mlp.experts.{e}.{theirs}.weight")
                     for e in range(cfg.n_experts)]), dt)
            if cfg.n_shared_experts:
                layer["shared_w1"] = jnp.asarray(
                    lin(pre + "mlp.shared_experts.gate_proj.weight"), dt)
                layer["shared_w3"] = jnp.asarray(
                    lin(pre + "mlp.shared_experts.up_proj.weight"), dt)
                layer["shared_w2"] = jnp.asarray(
                    lin(pre + "mlp.shared_experts.down_proj.weight"), dt)
        else:
            layer["w1"] = jnp.asarray(lin(pre + "mlp.gate_proj.weight"), dt)
            layer["w3"] = jnp.asarray(lin(pre + "mlp.up_proj.weight"), dt)
            layer["w2"] = jnp.asarray(lin(pre + "mlp.down_proj.weight"), dt)
        if cfg.q_lora_rank is None:
            layer["wq"] = jnp.asarray(lin(pre + "self_attn.q_proj.weight"), dt)
        else:
            layer["wq_a"] = jnp.asarray(lin(pre + "self_attn.q_a_proj.weight"), dt)
            layer["q_a_norm"] = jnp.asarray(
                npy(pre + "self_attn.q_a_layernorm.weight"), dt)
            layer["wq_b"] = jnp.asarray(lin(pre + "self_attn.q_b_proj.weight"), dt)
        params["layers"].append(layer)
    return cfg, params


def random_quantized_params(cfg: MLAConfig, key: Array, bits: int = 4,
                            lm_head_bits: Optional[int] = None) -> Dict:
    """Random packed codes directly (benchmarking; cf. llama.py)."""
    keys = iter(jax.random.split(key, 4 + cfg.n_layers * 10))
    dt = cfg.dtype

    def qlin(k_, din, dout, b=None):
        b = b if b is not None else bits
        codebook = "nf4" if b == "nf4" else None
        nb = 4 if codebook else b
        rows = {2: din // 4, 4: din // 2}.get(nb, din)
        data = jax.random.randint(k_, (rows, dout), 0, 256,
                                  jnp.int32).astype(jnp.uint8)
        if codebook:
            scale = jnp.full((1, dout), 1.0 / (din ** 0.5), jnp.float32)
            zp = jnp.zeros((1, dout), jnp.int32)
        else:
            scale = jnp.full((1, dout), 2.0 / ((1 << b) - 1) / (din ** 0.5),
                             jnp.float32)
            zp = jnp.full((1, dout), 1 << (b - 1), jnp.int32)
        return QuantizedLinear(data=data, scale=scale, zero_point=zp,
                               bits=nb, k=din, codebook=codebook)

    def dense(k_, din, dout, std=0.02):
        return (jax.random.normal(k_, (din, dout), jnp.float32) * std
                ).astype(dt)

    h, qk = cfg.n_heads, cfg.qk_head_dim
    params: Dict[str, Any] = {
        "embed": dense(next(keys), cfg.vocab_size, cfg.d_model),
        "final_norm": jnp.ones((cfg.d_model,), dt),
        "lm_head": (dense(next(keys), cfg.d_model, cfg.vocab_size)
                    if lm_head_bits is None
                    else qlin(next(keys), cfg.d_model, cfg.vocab_size,
                              lm_head_bits)),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), dt),
            "mlp_norm": jnp.ones((cfg.d_model,), dt),
            "kv_a": dense(next(keys), cfg.d_model,
                          cfg.kv_lora_rank + cfg.qk_rope_head_dim),
            "kv_a_norm": jnp.ones((cfg.kv_lora_rank,), dt),
            # kv_b stays DENSE bf16: the absorbed path uses its per-head
            # split directly (it is small: R x H*(nope+v))
            "kv_b": dense(next(keys), cfg.kv_lora_rank,
                          h * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
            "wo": qlin(next(keys), h * cfg.v_head_dim, cfg.d_model),
            "w1": qlin(next(keys), cfg.d_model, cfg.d_ff),
            "w3": qlin(next(keys), cfg.d_model, cfg.d_ff),
            "w2": qlin(next(keys), cfg.d_ff, cfg.d_model),
        }
        if cfg.q_lora_rank is None:
            layer["wq"] = qlin(next(keys), cfg.d_model, h * qk)
        else:
            layer["wq_a"] = qlin(next(keys), cfg.d_model, cfg.q_lora_rank)
            layer["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dt)
            layer["wq_b"] = qlin(next(keys), cfg.q_lora_rank, h * qk)
        params["layers"].append(layer)
    return params


def v2_lite_config(**kw) -> MLAConfig:
    """DeepSeek-V2-Lite geometry (15.7B, dense-MLP approximation: the real
    model is MoE; d_ff here gives a comparable per-layer FLOP/byte count)."""
    return MLAConfig(
        vocab_size=102_400, d_model=2048, n_layers=27, n_heads=16,
        d_ff=10_944, kv_lora_rank=512, q_lora_rank=None,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        rope_theta=10_000.0, max_seq_len=4096, **kw)


def param_shardings(cfg: MLAConfig, params: Dict, tp_axis: str = "tp") -> Dict:
    """PartitionSpec pytree for tensor parallelism: head-sharded q and
    kv_b up-projections (column), row-sharded wo; the latent kv_a path and
    its cache are REPLICATED (the latent is shared across heads — that is
    what makes MLA's TP cheap: only rank-R activations cross layers)."""
    from jax.sharding import PartitionSpec as P

    def layer_spec(layer):
        s = {}
        for k, v in layer.items():
            if k in ("wq", "wq_b", "kv_b", "w1", "w3"):
                s[k] = P(None, tp_axis)
            elif k in ("wo", "w2"):
                s[k] = P(tp_axis, None)
            else:
                s[k] = P()
        return s

    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, tp_axis),
        "layers": [layer_spec(l) for l in params["layers"]],
    }


def generate(
    cfg: MLAConfig,
    params: Dict,
    prompts: Array,            # [B, T] int32 (right-aligned, no padding)
    max_new_tokens: int = 32,
    key: Optional[Array] = None,
    temperature: float = 0.0,
) -> Array:
    """Batch generation through the absorbed-decode path (greedy by
    default): prefill fills the INT8 latent cache, then one jitted
    scan of decode steps.  Serving-engine integration (continuous
    batching over latent caches) is roadmap — this is the direct API."""
    b, t = prompts.shape
    max_len = t + max_new_tokens
    cache = init_latent_cache(cfg, b, max_len=max_len)
    logits, cache = jax.jit(
        lambda p, tk, c: forward(cfg, p, tk, cache=c)
    )(params, prompts, cache)
    tok0 = logits[:, -1].argmax(-1).astype(jnp.int32)

    if key is None:
        key = jax.random.key(0)

    @jax.jit
    def run(p, tok, pos, c, k):
        def step(carry, kk):
            tok, pos, c = carry
            lg, c = decode_step(cfg, p, tok, pos, c)
            if temperature > 0:
                nxt = jax.random.categorical(kk, lg / temperature, axis=-1)
            else:
                nxt = lg.argmax(-1)
            return (nxt.astype(jnp.int32), pos + 1, c), tok
        keys = jax.random.split(k, max_new_tokens)
        (_, _, c), toks = jax.lax.scan(step, (tok, pos, c), keys)
        return toks.T  # [B, max_new]

    pos0 = jnp.full((b,), t, jnp.int32)
    return run(params, tok0, pos0, cache, key)
