"""Llama-3-family model, TPU-native, weight-only quantized.

The flagship model for the serving slice (BASELINE.json: "weight-only INT4
Llama-3-8B decode with INT8 KV-cache").  Plain functional JAX: params are a
pytree of QuantizedLinear / float arrays, forward is a jit-able function —
no framework classes, so the same code path runs under jit, shard_map, and
the serving engine's continuous batcher.

Architecture: pre-norm transformer with RMSNorm, rotary embeddings, grouped-
query attention, SwiGLU MLP, untied or tied LM head — the Llama-3 recipe.

Sharding (tensor parallel over axis "tp"):
  * attention: q/k/v projections column-sharded over heads, o row-sharded;
  * MLP: w1/w3 column-sharded, w2 row-sharded;
  * KV cache sharded over the head axis.
`param_shardings` returns a matching pytree of PartitionSpecs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from piquant_tpu.quant.kv_cache import (
    KVCache,
    _quantize_sym,
    kv_cache_append_stacked,
    kv_cache_append_stacked_batch,
    kv_cache_init,
)
from piquant_tpu.quant.linear import (
    ACT_QUANT_MIN_M,
    QuantizedLinear,
    _quantize_act,
    quantize_linear_weight,
    quantized_matmul,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class YarnRope:
    """Standard YaRN rope scaling (transformers
    modeling_rope_utils._compute_yarn_parameters; the DeepSeek mscale
    variant lives in models/mla.py).  Hashable so LlamaConfig stays a
    valid static jit argument."""

    factor: float = 32.0
    original_max_position_embeddings: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    attention_factor: Optional[float] = None  # None: 0.1*ln(factor)+1
    truncate: bool = True


@dataclasses.dataclass(frozen=True)
class Llama3Rope:
    """Llama-3.1 rope scaling (transformers _compute_llama3_parameters):
    low-frequency components divided by `factor`, high-frequency kept,
    smooth interpolation between the wavelength bounds."""

    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128_256
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    d_ff: int = 14_336
    rope_theta: float = 500_000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 8192
    qkv_bias: bool = False       # Qwen2-style attention biases
    head_dim_override: Optional[int] = None  # Gemma: head_dim != d_model/heads
    norm_plus_one: bool = False  # Gemma RMSNorm scales by (1 + w)
    mlp_act: str = "silu"        # "silu" (Llama) or "gelu" (Gemma GeGLU)
    scale_embed: bool = False    # Gemma multiplies embeddings by sqrt(d_model)
    embed_multiplier: Optional[float] = None  # Granite: fixed embedding scale
    residual_multiplier: float = 1.0  # Granite: block outputs scaled before
                                      # the residual add
    logits_scaling: float = 1.0  # Granite: final logits DIVIDED by this
    sliding_window: Optional[int] = None  # Mistral: attend only to the last
                                          # `sliding_window` positions
    rotary_dim_override: Optional[int] = None  # Phi-style partial rotary:
                                               # rotate only the first
                                               # `rotary_dim` dims per head
    qk_norm: bool = False        # Qwen3: per-head RMSNorm on q/k before rope
    # Gemma-2 family:
    sandwich_norms: bool = False  # extra RMSNorm on the attention and MLP
                                  # OUTPUTS before the residual add
                                  # (post_attention/post_feedforward norms)
    attn_softcap: Optional[float] = None   # cap*tanh(scores/cap) pre-mask
    final_softcap: Optional[float] = None  # same cap on the lm_head logits
    attn_scale_override: Optional[float] = None  # score scale instead of
                                                 # head_dim**-0.5 (Gemma-2
                                                 # query_pre_attn_scalar**-0.5)
    sliding_pattern: Optional[int] = None  # alternate sliding/full layers:
                                           # layer li is FULL attention iff
                                           # (li+1) % pattern == 0, sliding
                                           # (cfg.sliding_window) otherwise
                                           # (Gemma-2: 2, Gemma-3: 6)
    # GPT-OSS family:
    attn_sinks: bool = False     # learned per-head sink logit in the softmax
                                 # denominator (dropped from the probs)
    o_bias: bool = False         # bias on the attention output projection
    router_bias: bool = False    # bias on the MoE router logits
    moe_bias: bool = False       # per-expert biases on gate/up/down projs
    moe_clamp_swiglu: bool = False  # (up+1) * gate*sigmoid(1.702*gate) with
                                    # gate<=7, |up|<=7 clamps
    yarn: Optional[YarnRope] = None
    # Llama-4 family:
    moe_every: Optional[int] = None  # MoE on layers with (li+1) % step == 0,
                                     # dense MLP otherwise (interleave_moe_
                                     # layer_step); None = all layers
    moe_input_scaled: bool = False   # Llama-4 router: sigmoid(top-k LOGITS)
                                     # scales the expert INPUT (not output)
    shared_expert_gated: bool = True  # False (Llama-4): ungated always-on
                                      # shared expert added to the routed sum
    qk_l2norm: bool = False          # weightless L2 norm on q/k after rope
                                     # (rope layers only)
    nope_pattern: Optional[int] = None  # NO rope on layers with
                                        # (li+1) % pattern == 0 (Llama-4: 4);
                                        # those layers use FULL attention
    attn_temp_tuning: bool = False   # nope layers: scale q by
                                     # log1p(floor((pos+1)/floor_scale))
                                     # * temp_attn_scale + 1
    floor_scale: float = 8192.0
    temp_attn_scale: float = 0.1
    chunk_window: Optional[int] = None  # Llama-4 chunked attention: rope
                                        # layers attend only within their
                                        # position chunk (kp//C == qp//C)
    rope_interleaved: bool = False   # checkpoint stores rope in interleaved
                                     # (complex-multiply) order — the loader
                                     # skips the GPT-NeoX half->interleaved
                                     # column permutation (Llama-4)
    llama3_rope: Optional[Llama3Rope] = None  # Llama-3.1+ frequency scaling
    # Gemma-3: sliding (local) layers use their own rope base; global
    # layers optionally linear-scale positions
    rope_theta_local: Optional[float] = None
    rope_linear_factor: Optional[float] = None  # global layers: inv/factor
    n_experts: int = 0           # Mixtral-style MoE MLP when > 1
    moe_top_k: int = 2           # experts per token (softmax over selected)
    moe_d_ff: Optional[int] = None          # expert hidden dim (default d_ff)
    shared_expert_d_ff: Optional[int] = None  # Qwen2-MoE always-on shared
                                              # expert hidden dim (None = off)
    moe_renormalize: bool = True   # True (Mixtral): renormalize the top-k
                                   # probs; False (Qwen2-MoE default): raw
                                   # softmax-over-all probs of the selected
    ep_axis: Optional[str] = None  # expert-parallel mesh axis: experts are
                                   # sharded over it (stacked leading dim),
                                   # outputs psum'd — run under shard_map
    moe_a2a: bool = False          # token-routed EP: Switch-style fixed-
                                   # capacity dispatch + quantized
                                   # all_to_all instead of the dense
                                   # all-tokens-every-device + psum (see
                                   # _moe_a2a; needs ep_axis)
    moe_capacity_factor: float = 2.0  # per-(src device, expert) dispatch
                                   # capacity = ceil(A/E * factor); overflow
                                   # assignments are DROPPED (standard
                                   # Switch behavior).  Set >= E/topk... i.e.
                                   # large enough that C >= A for exactness
    moe_wire_bits: Optional[int] = 8  # a2a payload: 8 = per-row symmetric
                                   # int8 wire (4x less ICI traffic than
                                   # f32), None = float wire (exact)
    act_quant_prefill: bool = False  # W4A8: int8 per-token activations for
                                     # LARGE-M (prefill) matmuls — 1.85x MXU
                                     # rate; small ppl cost (see
                                     # benchmarks/ppl_quality.py)
    kv_bits: int = 8                 # KV-cache code width: 8 (default) or
                                     # 4 (int4 codes — half the cache bytes
                                     # and read traffic; per-(pos, head)
                                     # symmetric-scale quality cost)
    act_quant_decode: bool = False   # int8 activations at EVERY M, incl.
                                     # decode.  Pays off for INT2 weights
                                     # (int8-plane kernel: 710 vs 380 GB/s
                                     # weight-stream); int4 decode stays
                                     # DMA-bound either way
    dtype: Any = jnp.bfloat16

    def layer_uses_rope(self, li: int) -> bool:
        return not (self.nope_pattern and (li + 1) % self.nope_pattern == 0)

    def layer_is_local(self, li: int) -> bool:
        """True for sliding/chunked layers in alternating layouts."""
        p = self.sliding_pattern or (self.nope_pattern if self.chunk_window
                                     else None)
        return bool(p) and (li + 1) % p != 0

    def layer_window(self, li: int):
        """(sliding_window, chunk_window) effective on layer li — the
        build_mask() selection as data: (None, None) = full attention.
        Mistral: every layer sliding; Gemma-2/3 & GPT-OSS: sliding on
        local layers; Llama-4: chunked on rope (local) layers."""
        if self.sliding_pattern:
            return ((self.sliding_window if self.layer_is_local(li)
                     else None), None)
        if self.chunk_window:
            return None, (self.chunk_window
                          if not self.nope_pattern or self.layer_is_local(li)
                          else None)
        return self.sliding_window, None

    def moe_layer(self, li: int) -> bool:
        if self.n_experts <= 1:
            return False
        return self.moe_every is None or (li + 1) % self.moe_every == 0

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.d_model // self.n_heads

    @property
    def rotary_dim(self) -> int:
        return self.rotary_dim_override or self.head_dim

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=32_000, d_model=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, d_ff=14_336, rope_theta=10_000.0, max_seq_len=8192,
            sliding_window=4096,
        )

    @staticmethod
    def qwen2_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=152_064, d_model=3584, n_layers=28, n_heads=28,
            n_kv_heads=4, d_ff=18_944, rope_theta=1_000_000.0,
            max_seq_len=32_768, qkv_bias=True,
        )

    @staticmethod
    def gemma_2b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=256_000, d_model=2048, n_layers=18, n_heads=8,
            n_kv_heads=1, d_ff=16_384, rope_theta=10_000.0, max_seq_len=8192,
            head_dim_override=256, norm_plus_one=True, mlp_act="gelu",
            scale_embed=True,
        )

    @staticmethod
    def gemma_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=256_000, d_model=3072, n_layers=28, n_heads=16,
            n_kv_heads=16, d_ff=24_576, rope_theta=10_000.0, max_seq_len=8192,
            head_dim_override=256, norm_plus_one=True, mlp_act="gelu",
            scale_embed=True,
        )

    @staticmethod
    def llama4_scout() -> "LlamaConfig":
        """Llama-4-Scout-17B-16E: every layer MoE (16 experts, top-1,
        input-scaled sigmoid routing, ungated shared expert), nope every
        4th layer with temperature tuning, chunked(8192) attention on rope
        layers, L2 qk-norm, Llama-3.1 rope scaling."""
        return LlamaConfig(
            vocab_size=202_048, d_model=5120, n_layers=48, n_heads=40,
            n_kv_heads=8, d_ff=16_384, rope_theta=500_000.0,
            max_seq_len=131_072, head_dim_override=128,
            n_experts=16, moe_top_k=1, moe_d_ff=8192,
            shared_expert_d_ff=8192, shared_expert_gated=False,
            moe_every=1, moe_input_scaled=True,
            qk_l2norm=True, nope_pattern=4, attn_temp_tuning=True,
            chunk_window=8192, rope_interleaved=True,
            llama3_rope=Llama3Rope(factor=8.0),
        )

    @staticmethod
    def gpt_oss_20b() -> "LlamaConfig":
        """GPT-OSS-20B: attention sinks, alternating sliding(128)/full
        layers, YaRN(x32), 32-expert top-4 clamped-swiglu MoE with biases
        on every projection."""
        return LlamaConfig(
            vocab_size=201_088, d_model=2880, n_layers=24, n_heads=64,
            n_kv_heads=8, d_ff=2880, rope_theta=150_000.0,
            max_seq_len=131_072, head_dim_override=64,
            qkv_bias=True, o_bias=True, attn_sinks=True,
            sliding_window=128, sliding_pattern=2,
            n_experts=32, moe_top_k=4, moe_d_ff=2880,
            moe_renormalize=True, router_bias=True, moe_bias=True,
            moe_clamp_swiglu=True,
            yarn=YarnRope(factor=32.0,
                          original_max_position_embeddings=4096,
                          truncate=False),
        )

    @staticmethod
    def gemma2_9b() -> "LlamaConfig":
        """Gemma-2-9B: sandwich norms, logit softcaps, alternating
        sliding(4096)/full attention, query_pre_attn_scalar=256."""
        return LlamaConfig(
            vocab_size=256_000, d_model=3584, n_layers=42, n_heads=16,
            n_kv_heads=8, d_ff=14_336, rope_theta=10_000.0, max_seq_len=8192,
            head_dim_override=256, norm_plus_one=True, mlp_act="gelu",
            scale_embed=True, sandwich_norms=True, attn_softcap=50.0,
            final_softcap=30.0, attn_scale_override=256.0 ** -0.5,
            sliding_window=4096, sliding_pattern=2,
        )

    @staticmethod
    def gemma3_12b() -> "LlamaConfig":
        """Gemma-3-12B: 5:1 sliding(1024)/full layout with dual rope
        bases (local 10k / global 1M linear-scaled x8), qk-norm, sandwich
        norms."""
        return LlamaConfig(
            vocab_size=262_208, d_model=3840, n_layers=48, n_heads=16,
            n_kv_heads=8, d_ff=15_360, rope_theta=1_000_000.0,
            max_seq_len=131_072, head_dim_override=256, norm_plus_one=True,
            mlp_act="gelu", scale_embed=True, sandwich_norms=True,
            qk_norm=True, attn_scale_override=256.0 ** -0.5,
            sliding_window=1024, sliding_pattern=6,
            rope_theta_local=10_000.0, rope_linear_factor=8.0,
        )

    @staticmethod
    def phi3_mini() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=32_064, d_model=3072, n_layers=32, n_heads=32,
            n_kv_heads=32, d_ff=8192, rope_theta=10_000.0, max_seq_len=4096,
        )

    @staticmethod
    def qwen3_8b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=151_936, d_model=4096, n_layers=36, n_heads=32,
            n_kv_heads=8, d_ff=12_288, rope_theta=1_000_000.0,
            max_seq_len=32_768, head_dim_override=128, qk_norm=True,
        )

    @staticmethod
    def mixtral_8x7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=32_000, d_model=4096, n_layers=32, n_heads=32,
            n_kv_heads=8, d_ff=14_336, rope_theta=1_000_000.0,
            max_seq_len=32_768, n_experts=8, moe_top_k=2,
        )

    @staticmethod
    def qwen3_moe_a3b() -> "LlamaConfig":
        """Qwen3-30B-A3B: qk-norm attention + 128-expert top-8 MoE
        (no shared expert; top-k renormalized per the released config)."""
        return LlamaConfig(
            vocab_size=151_936, d_model=2048, n_layers=48, n_heads=32,
            n_kv_heads=4, d_ff=6144, rope_theta=1_000_000.0,
            max_seq_len=32_768, head_dim_override=128, qk_norm=True,
            n_experts=128, moe_top_k=8, moe_d_ff=768,
            moe_renormalize=True,  # checkpoint config.json norm_topk_prob
        )

    @staticmethod
    def tiny(vocab: int = 256, **kw) -> "LlamaConfig":
        """Small config for tests / compile checks."""
        return LlamaConfig(
            vocab_size=vocab, d_model=256, n_layers=2, n_heads=8, n_kv_heads=4,
            d_ff=512, max_seq_len=256, **kw,
        )


# ---------------------------------------------------------------------------
# init / quantize
# ---------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: Array) -> Dict:
    """Random init (testing / benchmarking); loaders fill the same pytree."""
    keys = iter(jax.random.split(key, 8 + cfg.n_layers * (12 + 3 * cfg.n_experts)))
    dt = cfg.dtype

    def dense(k, din, dout, std=0.02):
        return (jax.random.normal(k, (din, dout), jnp.float32) * std).astype(dt)

    params: Dict[str, Any] = {
        "embed": dense(next(keys), cfg.vocab_size, cfg.d_model),
        "final_norm": jnp.ones((cfg.d_model,), dt),
        "lm_head": dense(next(keys), cfg.d_model, cfg.vocab_size),
        "layers": [],
    }
    hd = cfg.head_dim
    for li in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), dt),
            "mlp_norm": jnp.ones((cfg.d_model,), dt),
            "wq": dense(next(keys), cfg.d_model, cfg.n_heads * hd),
            "wk": dense(next(keys), cfg.d_model, cfg.n_kv_heads * hd),
            "wv": dense(next(keys), cfg.d_model, cfg.n_kv_heads * hd),
            "wo": dense(next(keys), cfg.n_heads * hd, cfg.d_model),
        }
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = jnp.ones((cfg.d_model,), dt)
            layer["post_mlp_norm"] = jnp.ones((cfg.d_model,), dt)
        if cfg.moe_layer(li):
            mff = cfg.moe_d_ff or cfg.d_ff
            layer["router"] = dense(next(keys), cfg.d_model, cfg.n_experts)
            layer["moe_w1"] = jnp.stack([dense(next(keys), cfg.d_model, mff)
                                         for _ in range(cfg.n_experts)])
            layer["moe_w3"] = jnp.stack([dense(next(keys), cfg.d_model, mff)
                                         for _ in range(cfg.n_experts)])
            layer["moe_w2"] = jnp.stack([dense(next(keys), mff, cfg.d_model)
                                         for _ in range(cfg.n_experts)])
            if cfg.shared_expert_d_ff:
                sff = cfg.shared_expert_d_ff
                layer["shared_w1"] = dense(next(keys), cfg.d_model, sff)
                layer["shared_w3"] = dense(next(keys), cfg.d_model, sff)
                layer["shared_w2"] = dense(next(keys), sff, cfg.d_model)
                if cfg.shared_expert_gated:
                    layer["shared_gate"] = dense(next(keys), cfg.d_model, 1)
        else:
            layer["w1"] = dense(next(keys), cfg.d_model, cfg.d_ff)
            layer["w3"] = dense(next(keys), cfg.d_model, cfg.d_ff)
            layer["w2"] = dense(next(keys), cfg.d_ff, cfg.d_model)
        if cfg.qkv_bias:
            layer["bq"] = jnp.zeros((cfg.n_heads * hd,), dt)
            layer["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), dt)
            layer["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), dt)
        if cfg.o_bias:
            layer["bo"] = jnp.zeros((cfg.d_model,), dt)
        if cfg.attn_sinks:
            layer["sinks"] = jnp.zeros((cfg.n_heads,), jnp.float32)
        if cfg.router_bias and "router" in layer:
            layer["router_b"] = jnp.zeros((cfg.n_experts,), jnp.float32)
        if cfg.moe_bias and "router" in layer:
            mffb = cfg.moe_d_ff or cfg.d_ff
            layer["moe_b1"] = jnp.zeros((cfg.n_experts, mffb), jnp.float32)
            layer["moe_b3"] = jnp.zeros((cfg.n_experts, mffb), jnp.float32)
            layer["moe_b2"] = jnp.zeros((cfg.n_experts, cfg.d_model), jnp.float32)
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((hd,), dt)
            layer["k_norm"] = jnp.ones((hd,), dt)
        params["layers"].append(layer)
    return params


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
               "shared_w1", "shared_w2", "shared_w3")
_MOE_QUANT_KEYS = ("moe_w1", "moe_w2", "moe_w3")


def random_quantized_params(cfg: LlamaConfig, key: Array, bits: int = 4,
                            lm_head_bits: Optional[int] = None,
                            group_size: Optional[int] = None,
                            mlp_bits: Optional[int] = None,
                            mlp_group_size: Optional[int] = None) -> Dict:
    """Build INT-quantized params DIRECTLY (random codes), never
    materializing float weights — lets an 8B model be constructed on a
    single chip for performance benchmarking (weight values don't matter
    for bandwidth/latency measurements).  `mlp_bits`/`mlp_group_size`
    build the mixed-precision recipe the auto planner picks (quant/mixed.py:
    attn at `bits`, MLP projections at `mlp_bits`)."""
    keys = iter(jax.random.split(key, 8 + cfg.n_layers * (12 + 3 * cfg.n_experts)))
    dt = cfg.dtype
    hd = cfg.head_dim

    def qlin(k_, din, dout, b=None, gs_req=None):
        b = b if b is not None else bits
        gs = gs_req if gs_req is not None else (
            group_size if b == bits and group_size else None)
        if gs and din % gs:
            gs = None
        codebook = "nf4" if b == "nf4" else None
        nb = 4 if codebook else b
        rows = {2: din // 4, 4: din // 2}.get(nb, din)
        g = din // gs if gs else 1
        data = jax.random.randint(k_, (rows, dout), 0, 256, jnp.int32).astype(jnp.uint8)
        if codebook:  # absmax scale; zp unused
            scale = jnp.full((g, dout), 1.0 / (din ** 0.5), jnp.float32)
            zp = jnp.zeros((g, dout), jnp.int32)
        else:
            scale = jnp.full((g, dout), 2.0 / ((1 << b) - 1) / (din ** 0.5), jnp.float32)
            zp = jnp.full((g, dout), (1 << (b - 1)), jnp.int32)
        from piquant_tpu.quant.linear import with_grouped_cache
        return with_grouped_cache(
            QuantizedLinear(data=data, scale=scale, zero_point=zp, bits=nb,
                            k=din, group_size=gs, codebook=codebook))

    def dense(k_, din, dout, std=0.02):
        return (jax.random.normal(k_, (din, dout), jnp.float32) * std).astype(dt)

    params: Dict[str, Any] = {
        "embed": dense(next(keys), cfg.vocab_size, cfg.d_model),
        "final_norm": jnp.ones((cfg.d_model,), dt),
        "lm_head": dense(next(keys), cfg.d_model, cfg.vocab_size)
        if lm_head_bits is None
        else qlin(next(keys), cfg.d_model, cfg.vocab_size, lm_head_bits),
        "layers": [],
    }
    for li in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), dt),
            "mlp_norm": jnp.ones((cfg.d_model,), dt),
            "wq": qlin(next(keys), cfg.d_model, cfg.n_heads * hd),
            "wk": qlin(next(keys), cfg.d_model, cfg.n_kv_heads * hd),
            "wv": qlin(next(keys), cfg.d_model, cfg.n_kv_heads * hd),
            "wo": qlin(next(keys), cfg.n_heads * hd, cfg.d_model),
        }
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = jnp.ones((cfg.d_model,), dt)
            layer["post_mlp_norm"] = jnp.ones((cfg.d_model,), dt)
        if cfg.moe_layer(li):
            from piquant_tpu.quant.linear import QuantizedExpertStack
            mff = cfg.moe_d_ff or cfg.d_ff
            layer["router"] = (jax.random.normal(
                next(keys), (cfg.d_model, cfg.n_experts), jnp.float32) * 0.02
                ).astype(dt)
            layer["moe_w1"] = QuantizedExpertStack.stack(
                [qlin(next(keys), cfg.d_model, mff)
                 for _ in range(cfg.n_experts)])
            layer["moe_w3"] = QuantizedExpertStack.stack(
                [qlin(next(keys), cfg.d_model, mff)
                 for _ in range(cfg.n_experts)])
            layer["moe_w2"] = QuantizedExpertStack.stack(
                [qlin(next(keys), mff, cfg.d_model)
                 for _ in range(cfg.n_experts)])
            if cfg.shared_expert_d_ff:
                sff = cfg.shared_expert_d_ff
                layer["shared_w1"] = qlin(next(keys), cfg.d_model, sff)
                layer["shared_w3"] = qlin(next(keys), cfg.d_model, sff)
                layer["shared_w2"] = qlin(next(keys), sff, cfg.d_model)
                if cfg.shared_expert_gated:
                    layer["shared_gate"] = dense(next(keys), cfg.d_model, 1)
        else:
            layer["w1"] = qlin(next(keys), cfg.d_model, cfg.d_ff,
                               mlp_bits, mlp_group_size)
            layer["w3"] = qlin(next(keys), cfg.d_model, cfg.d_ff,
                               mlp_bits, mlp_group_size)
            layer["w2"] = qlin(next(keys), cfg.d_ff, cfg.d_model,
                               mlp_bits, mlp_group_size)
        if cfg.qkv_bias:
            layer["bq"] = jnp.zeros((cfg.n_heads * hd,), dt)
            layer["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), dt)
            layer["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), dt)
        if cfg.o_bias:
            layer["bo"] = jnp.zeros((cfg.d_model,), dt)
        if cfg.attn_sinks:
            layer["sinks"] = jnp.zeros((cfg.n_heads,), jnp.float32)
        if cfg.router_bias and "router" in layer:
            layer["router_b"] = jnp.zeros((cfg.n_experts,), jnp.float32)
        if cfg.moe_bias and "router" in layer:
            mffb = cfg.moe_d_ff or cfg.d_ff
            layer["moe_b1"] = jnp.zeros((cfg.n_experts, mffb), jnp.float32)
            layer["moe_b3"] = jnp.zeros((cfg.n_experts, mffb), jnp.float32)
            layer["moe_b2"] = jnp.zeros((cfg.n_experts, cfg.d_model), jnp.float32)
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((hd,), dt)
            layer["k_norm"] = jnp.ones((hd,), dt)
        params["layers"].append(layer)
    return params


def quantize_params(params: Dict, bits: int = 4, *, channelwise: bool = True,
                    group_size: Optional[int] = None,
                    quantize_lm_head: bool = False,
                    overrides: Optional[Dict] = None) -> Dict:
    """Weight-only quantization of every linear; norms/embeddings/router
    stay float.  MoE expert stacks are quantized per expert (each expert
    gets its own channelwise scale/zp) and restacked.

    `overrides` maps weight names to `(bits, group_size)` (or bare bits)
    for mixed-precision recipes — e.g. the MLP weights (75% of 8B layer
    bytes) at INT2-g32 with attention kept INT4:
        overrides={"w1": (2, 32), "w3": (2, 32), "w2": (2, 32)}
    Per-layer keys `"{layer_idx}.{name}"` (e.g. `"3.w2"`) take precedence
    over bare names — the granularity quant/mixed.py's auto-planner emits."""
    from piquant_tpu.quant.linear import QuantizedExpertStack

    def cfg_for(li, k):
        o = (overrides or {}).get(f"{li}.{k}")
        if o is None:
            o = (overrides or {}).get(k)
        if o is None:
            return bits, group_size
        if isinstance(o, tuple):
            return o
        return o, group_size

    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        ql = dict(layer)
        for k in _QUANT_KEYS:
            if k in layer:
                b, gs = cfg_for(li, k)
                ql[k] = quantize_linear_weight(
                    layer[k], b, channelwise=channelwise, group_size=gs)
        for k in _MOE_QUANT_KEYS:
            if k in layer:
                b, gs = cfg_for(li, k)
                ql[k] = QuantizedExpertStack.stack([
                    quantize_linear_weight(layer[k][e], b,
                                           channelwise=channelwise,
                                           group_size=gs)
                    for e in range(layer[k].shape[0])])
        out["layers"].append(ql)
    if quantize_lm_head:
        out["lm_head"] = quantize_linear_weight(params["lm_head"], 8, channelwise=channelwise)
    return out




def requantize_params(params: Dict, bits=4, *,
                      group_size: Optional[int] = None) -> Dict:
    """Re-quantize every already-quantized linear at a different config
    (dequantize -> quantize; float leaves pass through).  The standard way
    to build a DRAFT model for two-model speculation from the same
    checkpoint: a harder-quantized copy agrees with the target on most
    tokens, so acceptance — and the tokens/forward payoff — is high."""
    from piquant_tpu.quant.linear import QuantizedExpertStack

    def conv(v):
        if isinstance(v, QuantizedLinear):
            return quantize_linear_weight(v.dequantize(jnp.float32), bits,
                                          group_size=group_size)
        if isinstance(v, QuantizedExpertStack):
            return QuantizedExpertStack.stack([
                quantize_linear_weight(v.expert(e).dequantize(jnp.float32),
                                       bits, group_size=group_size)
                for e in range(v.n_experts)])
        return v

    out = dict(params)
    out["layers"] = [{k: conv(v) for k, v in layer.items()}
                     for layer in params["layers"]]
    if isinstance(params.get("lm_head"), QuantizedLinear):
        out["lm_head"] = conv(params["lm_head"])
    return out


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class StaticInt:
    """Static pytree leaf: survives jit as a Python int (fused_tp is used
    in reshape shapes, so it must not become a tracer)."""
    value: int


def _concat_qlinear(qls):
    """Concatenate QuantizedLinear weights along N (same K/bits/group)."""
    first = qls[0]
    for q in qls[1:]:
        if (q.bits, q.k, q.group_size, q.codebook) != (
                first.bits, first.k, first.group_size, first.codebook):
            raise ValueError("cannot fuse mismatched quantized linears")
    from piquant_tpu.quant.linear import with_grouped_cache
    return with_grouped_cache(QuantizedLinear(
        data=jnp.concatenate([q.data for q in qls], axis=1),
        scale=jnp.concatenate([q.scale for q in qls], axis=1),
        zero_point=jnp.concatenate([q.zero_point for q in qls], axis=1),
        bits=first.bits, k=first.k, group_size=first.group_size,
        codebook=first.codebook))


def _interleave_cols(ws, tp: int):
    """Shard-interleave column blocks: output = concat over shard s of
    [w[0]_s | w[1]_s | ...] where w_s is w's s-th 1/tp column block — so a
    plain P(None, "tp") sharding of the fused matrix keeps every logical
    projection local to its shard."""
    if tp == 1:
        if isinstance(ws[0], QuantizedLinear):
            return _concat_qlinear(ws)
        return jnp.concatenate(ws, axis=1)
    pieces = []
    for st in range(tp):
        for w in ws:
            n = w.n if isinstance(w, QuantizedLinear) else w.shape[1]
            if n % tp:
                raise ValueError(f"N={n} not divisible by tp={tp}")
            blk = n // tp
            if isinstance(w, QuantizedLinear):
                pieces.append(QuantizedLinear(
                    data=w.data[:, st * blk:(st + 1) * blk],
                    scale=w.scale[:, st * blk:(st + 1) * blk],
                    zero_point=w.zero_point[:, st * blk:(st + 1) * blk],
                    bits=w.bits, k=w.k, group_size=w.group_size,
                    codebook=w.codebook))
            else:
                pieces.append(w[:, st * blk:(st + 1) * blk])
    if isinstance(ws[0], QuantizedLinear):
        return _concat_qlinear(pieces)
    return jnp.concatenate(pieces, axis=1)


def _split_interleaved(y: Array, sizes, tp: int):
    """Inverse of _interleave_cols on the matmul OUTPUT: y[..., N_total] ->
    per-projection tensors (pure reshapes/slices; column blocks within a
    shard are contiguous)."""
    if tp == 1:
        outs, off = [], 0
        for n in sizes:
            outs.append(y[..., off:off + n])
            off += n
        return outs
    lead = y.shape[:-1]
    per_shard = sum(n // tp for n in sizes)
    yr = y.reshape(*lead, tp, per_shard)
    outs, off = [], 0
    for n in sizes:
        blk = n // tp
        outs.append(yr[..., off:off + blk].reshape(*lead, n))
        off += blk
    return outs


def fuse_layer_projections(params: Dict, cfg: LlamaConfig, tp: int = 1) -> Dict:
    """Fuse per-layer wq/wk/wv -> wqkv and w1/w3 -> w13 (column concat,
    shard-interleaved for `tp`-way tensor parallelism).  7 -> 4 projections
    per layer: fewer kernel launches, fewer dispatch buffers, and the
    activations are read once per fused matmul.  Works on float or
    QuantizedLinear weights.  qkv_bias models keep unfused projections."""
    if cfg.qkv_bias:
        return params
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        if any(type(v).__name__ in ("LoraLinear", "MultiLoraLinear")
               for v in layer.values()):
            raise ValueError("merge_lora (quant/lora.py) before "
                             "fuse_layer_projections")
        nl = {k: v for k, v in layer.items()
              if k not in ("wq", "wk", "wv", "w1", "w3")}
        nl["wqkv"] = _interleave_cols([layer["wq"], layer["wk"], layer["wv"]], tp)
        # MoE layers carry moe_w1/moe_w3 + router instead of w1/w3: fuse only
        # the attention projections there
        if "w1" in layer:
            nl["w13"] = _interleave_cols([layer["w1"], layer["w3"]], tp)
        nl["fused_tp"] = StaticInt(tp)
        out["layers"].append(nl)
    return out


def _mm(x: Array, w, out_dtype, act_quant: bool = False) -> Array:
    if type(w).__name__ == "LoraLinear":   # quant/lora.py (lazy: no cycle)
        y = _mm(x, w.base, out_dtype, act_quant)
        delta = (x.astype(jnp.float32) @ w.a.astype(jnp.float32)
                 ) @ w.b.astype(jnp.float32) * w.scaling
        return (y.astype(jnp.float32) + delta).astype(out_dtype)
    if type(w).__name__ == "MultiLoraLinear":
        # per-batch-row adapter (multi-tenant serving, quant/lora.py):
        # gather the B selected rank-r factors and run two batched einsums
        # — reads B*K*r + B*r*N adapter bytes per call, ~2% of the packed
        # base stream at r=16 on 8B geometry
        y = _mm(x, w.base, out_dtype, act_quant)
        a_sel = w.a[w.ids].astype(jnp.float32)          # [B, K, r]
        b_sel = w.b[w.ids].astype(jnp.float32)          # [B, r, N]
        s_sel = w.scaling[w.ids].reshape(
            (w.ids.shape[0],) + (1,) * (x.ndim - 1))
        d1 = jnp.einsum("b...k,bkr->b...r", x.astype(jnp.float32), a_sel)
        delta = jnp.einsum("b...r,brn->b...n", d1, b_sel) * s_sel
        return (y.astype(jnp.float32) + delta).astype(out_dtype)
    if isinstance(w, QuantizedLinear):
        return quantized_matmul(x, w, out_dtype, act_quant=act_quant)
    return jnp.dot(x.astype(out_dtype), w.astype(out_dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: Array, w: Array, eps: float, plus_one: bool = False) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * (w + 1.0) if plus_one else normed * w


def _l2_norm(x: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                               + eps)).astype(x.dtype)


def _softmax_with_sinks(scores: Array, snk: Optional[Array]) -> Array:
    """softmax over the last axis; with sinks, exp(sink) joins the
    denominator only (HF GptOss eager_attention_forward: concat + softmax
    + drop the sink column)."""
    if snk is None:
        return jax.nn.softmax(scores, axis=-1)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), snk)
    e = jnp.exp(scores - m)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(snk - m))


def _rope_freqs(cfg: LlamaConfig, positions: Array,
                local: bool = False) -> Tuple[Array, Array]:
    rd = cfg.rotary_dim
    theta = (cfg.rope_theta_local
             if local and cfg.rope_theta_local else cfg.rope_theta)
    inv = 1.0 / (theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    scale = 1.0
    if local and cfg.rope_theta_local:
        pass  # Gemma-3 local rope: plain base, no scaling
    elif cfg.yarn is not None:
        inv, scale = _yarn_inv_freq(cfg)
    elif cfg.llama3_rope is not None:
        inv = _llama3_inv_freq(cfg, inv)
    elif cfg.rope_linear_factor:
        inv = inv / cfg.rope_linear_factor
    ang = positions[..., None].astype(jnp.float32) * inv  # [..., T, rd/2]
    return jnp.cos(ang) * scale, jnp.sin(ang) * scale


def _llama3_inv_freq(cfg: LlamaConfig, inv: Array) -> Array:
    """transformers _compute_llama3_parameters, re-derived."""
    import math

    r = cfg.llama3_rope
    old_len = r.original_max_position_embeddings
    low_wl = old_len / r.low_freq_factor
    high_wl = old_len / r.high_freq_factor
    wavelen = 2 * math.pi / inv
    scaled = jnp.where(wavelen > low_wl, inv / r.factor, inv)
    smooth = ((old_len / wavelen - r.low_freq_factor)
              / (r.high_freq_factor - r.low_freq_factor))
    smoothed = (1 - smooth) / r.factor * inv + smooth * inv
    medium = (wavelen >= high_wl) & (wavelen <= low_wl)
    return jnp.where(medium, smoothed, scaled)


def _yarn_inv_freq(cfg: LlamaConfig):
    """Standard YaRN (transformers _compute_yarn_parameters, re-derived):
    blend interpolated and extrapolated inverse frequencies with a linear
    ramp over the correction range; cos/sin scaled by attention_factor."""
    import math

    y = cfg.yarn
    rd = cfg.rotary_dim
    base = cfg.rope_theta
    orig = y.original_max_position_embeddings

    af = y.attention_factor
    if af is None:
        af = 0.1 * math.log(y.factor) + 1.0 if y.factor > 1 else 1.0

    def corr_dim(n_rot):
        return (rd * math.log(orig / (n_rot * 2 * math.pi))) / (2 * math.log(base))

    low, high = corr_dim(y.beta_fast), corr_dim(y.beta_slow)
    if y.truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, rd - 1)
    if low == high:
        high += 0.001

    pos_freqs = base ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd)
    extrap = 1.0 / pos_freqs
    interp = 1.0 / (y.factor * pos_freqs)
    ramp = jnp.clip((jnp.arange(rd // 2, dtype=jnp.float32) - low)
                    / (high - low), 0, 1)
    extrap_w = 1.0 - ramp
    return interp * (1 - extrap_w) + extrap * extrap_w, af


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: [B, H, T, D]; cos/sin: [B, T, R/2] -> rotate pairs (even, odd) of
    the first R dims; dims R..D pass through (Phi-style partial rotary when
    R < D)."""
    rd = 2 * cos.shape[-1]
    xf = x[..., :rd].astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    out = jnp.stack([r1, r2], axis=-1).reshape(xf.shape).astype(x.dtype)
    if rd == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rd:]], axis=-1)


def _attention(
    cfg: LlamaConfig,
    layer: Dict,
    x: Array,                # [B, T, D]
    positions: Array,        # [B, T]
    cache: Optional[KVCache],  # STACKED cache (leaves [L, B, H, S, D])
    layer_idx: int,
    mask: Array,             # [B, 1, T, S] additive
    attend_in_layer: bool = False,
    kv_write_start: Optional[Array] = None,  # scalar: contiguous prefill writes
    attn_window: Optional[int] = None,  # static: attend only to cache
                                        # positions < attn_window (caller
                                        # guarantees all positions fit) —
                                        # cuts decode cache traffic to the
                                        # live prefix instead of max_len
    pending: Optional[list] = None,     # deferred-append mode (decode t==1):
                                        # quantized k/v are stashed here and
                                        # written by ONE batched scatter after
                                        # the layer loop; the current token's
                                        # own contribution joins the softmax
                                        # from registers (the mask must then
                                        # EXCLUDE kv_pos == qp — forward()
                                        # builds it strict)
    flash_ok: bool = False,             # forward() proved the mask is plain
                                        # causal: the in-layer prefill branch
                                        # may use the tiled flash kernel
                                        # (ops/flash_prefill.py) instead of
                                        # materializing [B,H,T,S] scores
) -> Tuple[Array, Optional[KVCache]]:
    b, t, _ = x.shape
    hd = cfg.head_dim
    dt = cfg.dtype
    ascale = cfg.attn_scale_override or hd ** -0.5

    aq = "all" if cfg.act_quant_decode else cfg.act_quant_prefill
    if "wqkv" in layer:
        nq = cfg.n_heads * hd
        nkv = cfg.n_kv_heads * hd
        y = _mm(x, layer["wqkv"], dt, aq)
        q, k, v = _split_interleaved(y, (nq, nkv, nkv), layer["fused_tp"].value)
    else:
        q = _mm(x, layer["wq"], dt, aq)
        k = _mm(x, layer["wk"], dt, aq)
        v = _mm(x, layer["wv"], dt, aq)
        if cfg.qkv_bias:
            q = q + layer["bq"]
            k = k + layer["bk"]
            v = v + layer["bv"]
    q = q.reshape(b, t, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, cfg.n_kv_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, cfg.n_kv_heads, hd).transpose(0, 2, 1, 3)

    if cfg.qk_norm:  # Qwen3/Gemma-3: per-head RMSNorm before rope
        q = rms_norm(q, layer["q_norm"], cfg.rms_eps, cfg.norm_plus_one)
        k = rms_norm(k, layer["k_norm"], cfg.rms_eps, cfg.norm_plus_one)

    if cfg.layer_uses_rope(layer_idx):
        cos, sin = _rope_freqs(cfg, positions,
                               local=cfg.layer_is_local(layer_idx))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cfg.qk_l2norm:  # Llama-4: weightless L2 norm AFTER rope
            q = _l2_norm(q, cfg.rms_eps)
            k = _l2_norm(k, cfg.rms_eps)
    elif cfg.attn_temp_tuning:
        # Llama-4 nope layers: position-temperature scaling on q
        # (log1p(floor((pos+1)/floor_scale)) * scale + 1)
        sc = (jnp.log1p(jnp.floor((positions.astype(jnp.float32) + 1.0)
                                  / cfg.floor_scale))
              * cfg.temp_attn_scale + 1.0)                   # [B, T]
        q = (q.astype(jnp.float32) * sc[:, None, :, None]).astype(q.dtype)

    rep = cfg.n_heads // cfg.n_kv_heads
    qg = q.reshape(b, cfg.n_kv_heads, rep, t, hd)  # grouped heads: no repeat
    snk = None
    if cfg.attn_sinks:
        # GPT-OSS: learned per-head sink logit joins the softmax denominator
        # (and is dropped from the probabilities) — head h = kv*rep + r
        snk = layer["sinks"].astype(jnp.float32).reshape(
            cfg.n_kv_heads, rep)[None, :, :, None, None]  # [1,Hkv,rep,1,1]

    if cache is not None and pending is None:
        cache = kv_cache_append_stacked(cache, layer_idx, k, v, positions,
                                        contiguous_start=kv_write_start)
    elif pending is not None:
        kc_s, ks_s = _quantize_sym(k, cfg.kv_bits)  # [B,Hkv,1,D] / [B,Hkv,1,1]
        vc_s, vs_s = _quantize_sym(v, cfg.kv_bits)
        pending.append((kc_s, ks_s, vc_s, vs_s))
    if cache is not None and not attend_in_layer:
        import os as _os

        if (t == 1 and pending is None and jax.default_backend() == "tpu"
                and cfg.attn_softcap is None and snk is None
                and cfg.sliding_window is None and cfg.chunk_window is None
                and cfg.kv_bits == 8
                and _os.environ.get("PIQUANT_TPU_PALLAS_ATTN", "0") == "1"):
            # flash-decoding Pallas kernel (ops/pallas/attention.py).
            # OFF by default: the XLA int8-cache path below measured
            # 33 us/layer (cache-stream ~1 TB/s, i.e. at speed-of-light)
            # vs 228 us/layer for the Pallas kernel on 8B decode shapes —
            # kept for study/odd shapes only.
            from piquant_tpu.ops.pallas.attention import decode_attention

            ctx1 = decode_attention(
                qg[:, :, :, 0], cache.k_codes[layer_idx], cache.k_scale[layer_idx],
                cache.v_codes[layer_idx], cache.v_scale[layer_idx],
                positions[:, 0], ascale)
            if ctx1 is not None:
                ctx = ctx1[:, :, :, None]  # [B,Hkv,rep,1,D]
                ctx = ctx.astype(dt).reshape(b, cfg.n_heads, t, hd).transpose(0, 2, 1, 3)
                ctx = ctx.reshape(b, t, cfg.n_heads * hd)
                return _mm(ctx, layer["wo"], dt), cache
        # Fused INT8-cache attention: the dots consume int8 codes directly
        # (the bf16 convert fuses into the MXU operand read — the float
        # cache is never materialized) and the per-token scales fold into
        # the scores / probabilities as rank-1 corrections.
        if _os.environ.get("PIQUANT_SKIP_ATTN", "0") == "1":
            # attribution hook for benchmarks/decode_parts.py: ctx := q
            # (same [B,Hkv,rep,T,D] shape; skips scores/softmax/AV and all
            # cache reads)
            ctx = qg.astype(jnp.float32)
            ctx = ctx.astype(dt).reshape(b, cfg.n_heads, t, hd
                                         ).transpose(0, 2, 1, 3)
            ctx = ctx.reshape(b, t, cfg.n_heads * hd)
            return _mm(ctx, layer["wo"], dt, aq), cache
        a2 = _os.environ.get("PIQUANT_ATTN2", "1")
        if (t == 1 and pending is not None and not cfg.attn_softcap
                and a2 != "0"
                and (jax.default_backend() == "tpu" or a2 == "force")):
            # kv4 uses the pair-packed layout (quant/kv_cache.py) so the
            # stacked blocks keep full 128-lane rows — the kernel unpacks
            # nibbles in-register and reads HALF the kv8 cache bytes.
            # flash-decode v2 (ops/pallas/decode_attn2.py): reads only the
            # LIVE cache prefix (dead-chunk DMAs elided via scalar-prefetch
            # index maps) and unpacks kv4 nibbles in-register; the current
            # token + sink logits join the softmax below, exactly the
            # split-softmax recipe of the XLA path that follows.  The
            # STACKED cache goes in whole (layer picked by the kernel's
            # block index maps) — slicing it here would materialize a full
            # per-layer cache copy, XLA can't fuse slices into custom
            # calls.  Live-length clamping subsumes attn_window.
            from piquant_tpu.ops.pallas.decode_attn2 import (
                decode_attention_state)

            # Windowed layers: the kernel takes a per-row window START and
            # masks idx < start (and elides the dead leading-chunk DMAs) —
            # the exact build_mask semantics.  Sliding: kp > qp - w;
            # Llama-4 chunk: kp // C == qp // C.  Full layers in
            # alternating layouts (layer_is_local False) keep start = 0.
            pos_b = positions[:, 0]
            win, chunk = cfg.layer_window(layer_idx)
            if win is not None:
                starts = jnp.maximum(pos_b - jnp.int32(win - 1), 0)
            elif chunk is not None:
                starts = (pos_b // jnp.int32(chunk)) * jnp.int32(chunk)
            else:
                starts = None
            st = decode_attention_state(
                qg[:, :, :, 0], cache.k_codes, cache.k_scale,
                cache.v_codes, cache.v_scale,
                pos_b, ascale, layer=layer_idx, starts=starts,
                interpret=(jax.default_backend() != "tpu"))
            if st is not None:
                acc, m_c, l_c = st        # [B,Hkv,rep,D], [B,Hkv,rep,1] x2
                kq, ksq, vq, vsq = pending[-1]
                if cfg.kv_bits == 4:
                    from piquant_tpu.quant.kv_cache import unpack4

                    kq, vq = unpack4(kq), unpack4(vq)
                s_self = jnp.einsum(
                    "bhrtd,bhsd->bhrts", qg.astype(jnp.bfloat16),
                    kq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                s_self = (s_self * ksq[:, :, None] * ascale)[:, :, :, 0, :]
                m2 = jnp.maximum(m_c, s_self)        # [B, Hkv, rep, 1]
                if snk is not None:
                    m2 = jnp.maximum(m2, snk[:, :, :, 0])
                ec = jnp.exp(m_c - m2)
                es = jnp.exp(s_self - m2)
                denom = l_c * ec + es
                if snk is not None:
                    denom = denom + jnp.exp(snk[:, :, :, 0] - m2)
                v_self = vq.astype(jnp.float32) * vsq    # [B, Hkv, 1, D]
                ctx = (acc * ec + es * v_self) / denom
                ctx = ctx[:, :, :, None]                 # [B,Hkv,rep,1,D]
                ctx = ctx.astype(dt).reshape(b, cfg.n_heads, t, hd
                                             ).transpose(0, 2, 1, 3)
                ctx = ctx.reshape(b, t, cfg.n_heads * hd)
                out = _mm(ctx, layer["wo"], dt, aq)
                if cfg.o_bias:
                    out = out + layer["bo"]
                return out, cache
        w = attn_window or cache.max_len
        if cfg.kv_bits == 4:
            # pair-packed cache: the HBM read is D/2 bytes per position
            # (half the kv8 traffic); the unpack is VPU work fused into
            # the dot's operand read
            from piquant_tpu.quant.kv_cache import (merge_scale_pairs,
                                                    unpack4_pairs)

            wr = (w + 1) // 2  # packed rows covering the window
            kc = unpack4_pairs(cache.k_codes[layer_idx, :, :, :wr])[:, :, :w]
            vc = unpack4_pairs(cache.v_codes[layer_idx, :, :, :wr])[:, :, :w]
            ks_w = merge_scale_pairs(
                cache.k_scale[layer_idx][..., :wr])[:, :, :w]
            vs_w = merge_scale_pairs(
                cache.v_scale[layer_idx][..., :wr])[:, :, :w]
        else:
            kc = cache.k_codes[layer_idx, :, :, :w]  # [B, Hkv, W, D] int8
            vc = cache.v_codes[layer_idx, :, :, :w]
            ks_w = cache.k_scale[layer_idx, :, :, :w]
            vs_w = cache.v_scale[layer_idx, :, :, :w]
        ks = ks_w[:, :, None, None, :, 0]
        vs = vs_w[:, :, :, 0]                                  # [B, Hkv, W]
        scores = jnp.einsum(
            "bhrtd,bhsd->bhrts", qg.astype(jnp.bfloat16), kc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32) * ks
        scores = scores * ascale
        if cfg.attn_softcap:  # Gemma-2: cap*tanh(s/cap) BEFORE the mask
            scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
        scores = scores + mask[:, None]
        if pending is not None:
            # deferred append: the cache does NOT hold the current token
            # (mask is strict), so its contribution joins the softmax from
            # registers via a split logsumexp.  Uses the DEQUANTIZED self
            # k/v — identical math to appending the int8 codes and reading
            # them back, without the per-layer scatter.
            # same precision recipe as the cache stream: bf16 dot on the raw
            # int8 codes (exact in bf16), f32 rank-1 scale fold — keeps the
            # deferred logits within float-association noise of the
            # append-then-read path
            kq, ksq, vq, vsq = pending[-1]
            if cfg.kv_bits == 4:
                from piquant_tpu.quant.kv_cache import unpack4

                kq, vq = unpack4(kq), unpack4(vq)
            s_self = jnp.einsum(
                "bhrtd,bhsd->bhrts", qg.astype(jnp.bfloat16),
                kq.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) * ksq[:, :, None]
            s_self = s_self * ascale
            if cfg.attn_softcap:
                s_self = cfg.attn_softcap * jnp.tanh(s_self / cfg.attn_softcap)
            m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), s_self)
            if snk is not None:
                m = jnp.maximum(m, snk)
            ec = jnp.exp(scores - m)                       # [B, Hkv, r, 1, W]
            es = jnp.exp(s_self - m)                       # [B, Hkv, r, 1, 1]
            denom = jnp.sum(ec, axis=-1, keepdims=True) + es
            if snk is not None:
                denom = denom + jnp.exp(snk - m)
            # normalize BEFORE the bf16 cast: the cast then rounds the same
            # probability values the append-then-read softmax rounds, so the
            # two paths agree to float-association noise
            pscaled = (ec / denom * vs[:, :, None, None, :]).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhrts,bhsd->bhrtd", pscaled,
                             vc.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            ps_self = (es / denom * vsq[:, :, None]).astype(jnp.bfloat16)
            ctx = ctx + (ps_self.astype(jnp.float32)
                         * vq.astype(jnp.float32)[:, :, None])
        else:
            probs = _softmax_with_sinks(scores, snk)
            pscaled = (probs * vs[:, :, None, None, :]).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhrts,bhsd->bhrtd", pscaled, vc.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
    else:
        # in-layer attention (no cache, or fresh prefill): float k/v
        ctx = None
        if flash_ok:
            # tiled flash kernel: O(T) attention memory, no [B,H,T,S]
            # scores round-trip — and lifts the B*ctx ~ 8k single-chip
            # prefill cap the materialized path has.  The dispatcher
            # routes windowed/chunked/softcap/sink geometries to the
            # native masked kernel (ops/pallas/flash.py) and plain causal
            # to the shipped Mosaic kernel.
            from piquant_tpu.ops.flash_prefill import flash_prefill

            win, chunk = cfg.layer_window(layer_idx)
            snk2 = (layer["sinks"].astype(jnp.float32)
                    .reshape(cfg.n_kv_heads, rep) if cfg.attn_sinks
                    else None)
            ctx = flash_prefill(qg, k, v, ascale, pos0=positions[:, 0],
                                window=win, chunk=chunk,
                                softcap=cfg.attn_softcap, sinks=snk2)
        if ctx is None:
            scores = jnp.einsum(
                "bhrtd,bhsd->bhrts", qg.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            scores = scores * ascale
            if cfg.attn_softcap:
                scores = cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
            scores = scores + mask[:, None]
            probs = _softmax_with_sinks(scores, snk)
            ctx = jnp.einsum("bhrts,bhsd->bhrtd", probs.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

    ctx = ctx.astype(dt).reshape(b, cfg.n_heads, t, hd).transpose(0, 2, 1, 3)
    ctx = ctx.reshape(b, t, cfg.n_heads * hd)
    out = _mm(ctx, layer["wo"], dt, aq)
    if cfg.o_bias:
        out = out + layer["bo"]
    return out, cache


def _expert_weight(stack, i: int):
    """Expert i of a stacked MoE weight (QuantizedExpertStack or float
    [E, K, N] array) as a 2-D linear for `_mm`."""
    if hasattr(stack, "expert"):
        return stack.expert(i)
    return stack[i]


def _mlp_moe(cfg: LlamaConfig, layer: Dict, x: Array) -> Array:
    """Mixtral-style sparse MoE MLP (SURVEY.md §2.3: the EP strategy).

    Routing: top-k of the router logits per token, softmax over the
    SELECTED logits (the Mixtral normalization).  Compute: every local
    expert processes all tokens, masked by its routing weight — on TPU the
    dense-weighted form stays jit-static (no data-dependent shapes) and the
    weight traffic, not FLOPs, bounds decode anyway.  Under expert
    parallelism (cfg.ep_axis inside shard_map) each device holds
    E/ep whole experts (stacked leading dim sharded), computes their masked
    contributions, and the psum here completes the token outputs."""
    dt = cfg.dtype
    aq = "all" if cfg.act_quant_decode else cfg.act_quant_prefill
    logits = jnp.einsum("btd,de->bte", x.astype(jnp.float32),
                        layer["router"].astype(jnp.float32))
    if cfg.router_bias:
        logits = logits + layer["router_b"].astype(jnp.float32)
    if cfg.moe_input_scaled:
        # Llama-4 router: sigmoid over the top-k LOGITS; the score scales
        # the expert INPUT in _moe_dense (not the output — nonlinear, so
        # the two are NOT equivalent)
        probs, topi = jax.lax.top_k(logits, cfg.moe_top_k)  # [B, T, k]
        probs = jax.nn.sigmoid(probs)
    else:
        full = jax.nn.softmax(logits, axis=-1)
        probs, topi = jax.lax.top_k(full, cfg.moe_top_k)    # [B, T, k]
        if cfg.moe_renormalize:  # Mixtral: softmax over the SELECTED logits
            probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    w1s, w3s, w2s = layer["moe_w1"], layer["moe_w3"], layer["moe_w2"]
    e_local = (w1s.n_experts if hasattr(w1s, "n_experts")
               else w1s.shape[0])
    off = (jax.lax.axis_index(cfg.ep_axis) * e_local
           if cfg.ep_axis is not None else 0)

    y = None
    if (cfg.ep_axis is not None and cfg.moe_a2a
            and not (cfg.moe_input_scaled or cfg.moe_clamp_swiglu
                     or cfg.moe_bias)):
        ep = jax.lax.axis_size(cfg.ep_axis)
        if (x.shape[0] * x.shape[1]) % ep == 0:
            y = _moe_a2a(cfg, layer, x, probs, topi, e_local, aq)
    if y is None:
        y = _moe_ragged_try(cfg, layer, x, probs, topi)
    if y is None:
        y = _moe_dense(cfg, layer, x, probs, topi, e_local, off, aq)
    if "shared_w1" in layer:
        # Qwen2-MoE: always-on MLP scaled by a sigmoid gate;
        # Llama-4 (shared_expert_gated=False): plain always-on MLP
        g = _mm(x, layer["shared_w1"], dt, aq)
        u = _mm(x, layer["shared_w3"], dt, aq)
        gf = g.astype(jnp.float32)
        act = (jax.nn.gelu(gf, approximate=True) if cfg.mlp_act == "gelu"
               else jax.nn.silu(gf))
        h = (act * u.astype(jnp.float32)).astype(dt)
        sh = _mm(h, layer["shared_w2"], dt, aq).astype(jnp.float32)
        if cfg.shared_expert_gated:
            gate = jax.nn.sigmoid(
                x.astype(jnp.float32) @ layer["shared_gate"].astype(jnp.float32))
            sh = gate * sh
        y = y + sh
    return y.astype(dt)


def _moe_ragged_try(cfg: LlamaConfig, layer: Dict, x: Array, probs: Array,
                    topi: Array) -> Optional[Array]:
    """Grouped (megablocks-style) MoE compute: FLOPs scale with top_k/E
    instead of evaluating every expert densely (quant/moe.py routing +
    ops/pallas/qmatmul.w4_ragged_matmul).  Returns None when the geometry
    or backend can't take the ragged kernel (caller falls back to dense)."""
    import os as _os

    env = _os.environ.get("PIQUANT_MOE_RAGGED", "1")
    w1s = layer["moe_w1"]
    b, t, d = x.shape
    ntok = b * t
    # act-quant (W4A8/W2A8) rides the ragged path only for channelwise
    # 2/4-bit stacks (the int8-dot kernel's domain), matching the dense
    # path's activation policy ("all" at every M, prefill above the
    # MXU-bound threshold)
    want_aq = bool(cfg.act_quant_decode
                   or (cfg.act_quant_prefill and ntok >= ACT_QUANT_MIN_M))
    if (env == "0" or cfg.ep_axis is not None
            or cfg.moe_bias or cfg.moe_clamp_swiglu or cfg.moe_input_scaled
            or not hasattr(w1s, "bits") or w1s.bits not in (2, 4, 8)
            or getattr(w1s, "codebook", None) is not None
            or ntok < 32      # decode: dense-masked WINS (r5 measured, M=8
                              # Mixtral geometry: dense 2.20 vs ragged 2.69
                              # ms/layer; all-expert DMA floor 0.86) — the
                              # ragged sort/dispatch overhead dominates at
                              # tiny M while weight traffic is the same
            or ((cfg.act_quant_decode or cfg.act_quant_prefill) and not (
                want_aq and w1s.bits in (2, 4) and w1s.group_size is None))
            or (jax.default_backend() != "tpu" and env != "force")):
        return None
    from piquant_tpu.ops.pallas import qmatmul as _qmm
    from piquant_tpu.quant import moe as _moe

    e = w1s.n_experts
    # bm=128 regardless of token count: weight traffic scales with the
    # number of row BLOCKS (each block streams its expert's tiles), so
    # fewer, larger blocks beat less padding — the padded rows are
    # DMA-for-free next to the weight stream
    bmr = 128
    r = _moe.build_ragged_routing(topi, probs, e, bmr)
    xs = _moe.scatter_tokens(x.reshape(ntok, d).astype(cfg.dtype), r)

    def mm(v, stack):
        if want_aq:
            vq, vs = _quantize_act(v)
            return _qmm.wq_ragged_matmul_a8(vq, vs, stack, r.block_expert,
                                            cfg.dtype)
        return _qmm.w4_ragged_matmul(v, stack, r.block_expert, cfg.dtype)

    g = mm(xs, w1s)
    u = mm(xs, layer["moe_w3"])
    if g is None or u is None:
        return None
    gf = g.astype(jnp.float32)
    act = (jax.nn.gelu(gf, approximate=True) if cfg.mlp_act == "gelu"
           else jax.nn.silu(gf))
    h = (act * u.astype(jnp.float32)).astype(cfg.dtype)
    o = mm(h, layer["moe_w2"])
    if o is None:
        return None
    return _moe.combine_tokens(o, r, ntok).reshape(b, t, d)


def _moe_dense(cfg: LlamaConfig, layer: Dict, x: Array, probs: Array,
               topi: Array, e_local: int, off, aq) -> Array:
    """Dense-all-experts compute as ONE lax.scan over the stacked expert
    weights: a single compiled body instead of e_local unrolled matmul
    graphs (the unrolled form took ~10x longer to compile at Mixtral
    scale through the remote compiler; runtime is identical — the scan
    is sequential just like the unrolled loop)."""
    dt = cfg.dtype
    w1s, w3s, w2s = layer["moe_w1"], layer["moe_w3"], layer["moe_w2"]

    def as_linear(st):
        # scan slices every pytree leaf's leading (expert) axis; rebuild a
        # 2-D QuantizedLinear view from the sliced QuantizedExpertStack
        if hasattr(st, "bits"):
            return QuantizedLinear(data=st.data, scale=st.scale,
                                   zero_point=st.zero_point, bits=st.bits,
                                   k=st.k, group_size=st.group_size,
                                   s_chunk=getattr(st, "s_chunk", None),
                                   z_chunk=getattr(st, "z_chunk", None),
                                   codebook=getattr(st, "codebook", None))
        return st  # float [K, N] slice

    def body(y, per):
        if cfg.moe_bias:
            el, e1, e3, e2, b1, b3, b2 = per
        else:
            el, e1, e3, e2 = per
            b1 = b3 = b2 = None
        gate = jnp.sum(jnp.where(topi == off + el, probs, 0.0),
                       axis=-1, keepdims=True)               # [B, T, 1]
        if cfg.moe_input_scaled:  # Llama-4: score scales the INPUT
            xin = (x.astype(jnp.float32) * gate).astype(dt)
            gate = jnp.where(gate > 0, 1.0, 0.0)  # output: plain masked sum
        else:
            xin = x
        g = _mm(xin, as_linear(e1), dt, aq)
        u = _mm(xin, as_linear(e3), dt, aq)
        gf = g.astype(jnp.float32)
        uf = u.astype(jnp.float32)
        if b1 is not None:
            gf = gf + b1.astype(jnp.float32)
            uf = uf + b3.astype(jnp.float32)
        if cfg.moe_clamp_swiglu:
            # GPT-OSS: clamped swiglu with the +1 offset on `up`
            gf = jnp.minimum(gf, 7.0)
            uf = jnp.clip(uf, -7.0, 7.0)
            h = ((uf + 1.0) * (gf * jax.nn.sigmoid(1.702 * gf))).astype(dt)
        else:
            act = (jax.nn.gelu(gf, approximate=True) if cfg.mlp_act == "gelu"
                   else jax.nn.silu(gf))
            h = (act * uf).astype(dt)
        o = _mm(h, as_linear(e2), dt, aq).astype(jnp.float32)
        if b2 is not None:
            o = o + b2.astype(jnp.float32)
        y = y + o * gate
        return y, None

    y0 = jnp.zeros(x.shape, jnp.float32)
    if cfg.ep_axis is not None:
        # under shard_map the body's output varies over the ep axis (the
        # gate uses axis_index); the initial carry must match that vma type
        y0 = jax.lax.pvary(y0, (cfg.ep_axis,))
    xs = (jnp.arange(e_local, dtype=jnp.int32), w1s, w3s, w2s)
    if cfg.moe_bias:
        xs = xs + (layer["moe_b1"], layer["moe_b3"], layer["moe_b2"])
    y, _ = jax.lax.scan(body, y0, xs)
    if cfg.ep_axis is not None:
        y = jax.lax.psum(y, cfg.ep_axis)
    return y


def _wire_q8(v: Array):
    """Per-row symmetric int8 wire quantization for the a2a payload
    (v [..., d] -> int8 codes + f32 row scales; cf.
    parallel/collectives.py — same dynamic-quantize-per-hop idea,
    per-token granularity because expert inputs are single tokens)."""
    amax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)
    return q, s


def _moe_a2a(cfg: LlamaConfig, layer: Dict, x: Array, probs: Array,
             topi: Array, e_local: int, aq) -> Array:
    """Token-routed expert parallelism: the real MoE scaling pattern
    (Switch/DeepSeek dispatch) instead of dense all-tokens-on-every-device
    + psum.

    Inside shard_map with x REPLICATED over `ep_axis`, each device:
      1. takes its contiguous 1/ep token slice and packs the routed
         activations into fixed-capacity per-(src, expert) buffers
         (capacity C = ceil(slice_assignments/E * moe_capacity_factor);
         overflow assignments drop — the standard capacity-factor trade;
         C large enough => exact);
      2. `lax.all_to_all`s the buffers so every device receives ONLY its
         local experts' tokens — with moe_wire_bits=8 the payload rides
         as per-token int8 + f32 scales (4x less ICI traffic, the
         quantized-collectives design of parallel/collectives.py);
      3. runs its local expert MLPs on [ep*C] real tokens per expert
         (vs ALL tokens masked in _moe_dense — an E/top_k FLOP cut);
      4. a2a's the outputs back (quantized again), combines them into its
         token slice, and psums the scattered slices back to replicated.

    The headline win is COMPUTE: each device runs its experts on the
    ntok*top_k/ep routed tokens instead of all ntok tokens per local
    expert — an E/top_k FLOP cut (4x at Mixtral geometry).  Wire: two
    int8 a2a hops of ntok/ep * top_k * d bytes each (tiny) plus the same
    combine psum the dense path pays; the combine could ride an
    all_gather at half the traffic once shard_map's vma checker can type
    it (see the combine note below).  Numerically: int8 wire adds
    ~0.4%/element noise (exact with moe_wire_bits=None); drops change
    outputs only when capacity overflows (tests pin both).
    """
    dt = cfg.dtype
    ep = jax.lax.axis_size(cfg.ep_axis)
    r = jax.lax.axis_index(cfg.ep_axis)
    b, t, d = x.shape
    ntok = b * t
    n_s = ntok // ep
    e = e_local * ep
    k = cfg.moe_top_k
    xf = x.reshape(ntok, d).astype(jnp.float32)
    xs = jax.lax.dynamic_slice_in_dim(xf, r * n_s, n_s, 0)          # [n_s, d]
    ti = jax.lax.dynamic_slice_in_dim(topi.reshape(ntok, k), r * n_s, n_s, 0)
    pr = jax.lax.dynamic_slice_in_dim(probs.reshape(ntok, k), r * n_s, n_s, 0)
    a = n_s * k
    ea = ti.reshape(a)                                   # assignment expert
    wa = pr.reshape(a).astype(jnp.float32)               # assignment weight
    ta = jnp.repeat(jnp.arange(n_s, dtype=jnp.int32), k)  # assignment token
    import math

    cap = min(max(int(math.ceil(a / e * cfg.moe_capacity_factor)), 1), a)

    # position of each assignment within its expert's capacity slots
    onehot = jax.nn.one_hot(ea, e, dtype=jnp.int32)                 # [A, E]
    pa = jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=1) - 1   # [A]
    keep = pa < cap

    # dispatch [E, C, d]: overflow rows (pa >= cap) scatter out of bounds
    # and are dropped
    disp = jnp.zeros((e, cap, d), jnp.float32).at[ea, pa].set(
        xs[ta], mode="drop")

    def a2a(v):
        # tiled all_to_all over the leading (global-expert) axis: row block
        # j of the result is what device j sent for MY local experts
        return jax.lax.all_to_all(v, cfg.ep_axis, split_axis=0,
                                  concat_axis=0, tiled=True)

    if cfg.moe_wire_bits == 8:
        q, s = _wire_q8(disp)
        h_in = a2a(q).astype(jnp.float32) * a2a(s)
    else:
        h_in = a2a(disp)
    # [E, C, d] (blocks: [sender, my local expert]) -> [e_local, ep*C, d]
    h = h_in.reshape(ep, e_local, cap, d).transpose(1, 0, 2, 3).reshape(
        e_local, ep * cap, d).astype(dt)

    w1s, w3s, w2s = layer["moe_w1"], layer["moe_w3"], layer["moe_w2"]

    def as_linear(st):
        if hasattr(st, "bits"):
            return QuantizedLinear(data=st.data, scale=st.scale,
                                   zero_point=st.zero_point, bits=st.bits,
                                   k=st.k, group_size=st.group_size,
                                   s_chunk=getattr(st, "s_chunk", None),
                                   z_chunk=getattr(st, "z_chunk", None),
                                   codebook=getattr(st, "codebook", None))
        return st

    def body(_, per):
        e1, e3, e2, hrow = per                           # hrow [ep*C, d]
        g = _mm(hrow, as_linear(e1), dt, aq)
        u = _mm(hrow, as_linear(e3), dt, aq)
        gf = g.astype(jnp.float32)
        act = (jax.nn.gelu(gf, approximate=True) if cfg.mlp_act == "gelu"
               else jax.nn.silu(gf))
        hmid = (act * u.astype(jnp.float32)).astype(dt)
        o = _mm(hmid, as_linear(e2), dt, aq).astype(jnp.float32)
        return None, o

    _, y_loc = jax.lax.scan(body, None, (w1s, w3s, w2s, h))
    # [e_local, ep*C, d] -> [E, C, d] with sender-major blocks for the
    # return a2a (each sender gets back exactly the slots it dispatched)
    y_out = y_loc.reshape(e_local, ep, cap, d).transpose(1, 0, 2, 3).reshape(
        e, cap, d)
    if cfg.moe_wire_bits == 8:
        q, s = _wire_q8(y_out)
        out_buf = a2a(q).astype(jnp.float32) * a2a(s)
    else:
        out_buf = a2a(y_out)

    # combine: out_buf[ea, pa] is this assignment's expert output
    ga = out_buf[ea, jnp.minimum(pa, cap - 1)]
    ga = jnp.where(keep[:, None], ga, 0.0)
    ys = jnp.zeros((n_s, d), jnp.float32).at[ta].add(wa[:, None] * ga)
    # replicate the combined slices: scatter into the full token range and
    # psum (an all_gather would halve the traffic, but its vma type is not
    # inferable as replicated under shard_map's checker in current jax —
    # the psum form is, and matches the dense path's combine collective)
    y = jnp.zeros((ntok, d), jnp.float32)
    y = jax.lax.dynamic_update_slice_in_dim(y, ys, r * n_s, 0)
    y = jax.lax.psum(y, cfg.ep_axis)
    return y.reshape(b, t, d)


def _mlp(cfg: LlamaConfig, layer: Dict, x: Array) -> Array:
    if "router" in layer:
        return _mlp_moe(cfg, layer, x)
    dt = cfg.dtype
    aq = "all" if cfg.act_quant_decode else cfg.act_quant_prefill
    if "w13" in layer:
        if (not aq and layer["fused_tp"].value == 1
                and cfg.mlp_act in ("silu", "gelu")
                and type(layer["w13"]).__name__ == "QuantizedLinear"
                and type(layer["w2"]).__name__ == "QuantizedLinear"
                and jax.default_backend() == "tpu"):
            # MLP megakernel: w13 -> SwiGLU -> w2 in ONE pallas call at
            # decode M — the intermediate stays in VMEM and the
            # w13->w2 kernel-boundary DMA drain/fill disappears
            from piquant_tpu.ops.pallas.qmatmul import mlp_fused_matmul

            yf = mlp_fused_matmul(x, layer["w13"], layer["w2"],
                                  cfg.mlp_act, dt)
            if yf is not None:
                return yf
        y = _mm(x, layer["w13"], dt, aq)
        g, u = _split_interleaved(y, (cfg.d_ff, cfg.d_ff), layer["fused_tp"].value)
    else:
        g = _mm(x, layer["w1"], dt, aq)
        u = _mm(x, layer["w3"], dt, aq)
    gf = g.astype(jnp.float32)
    act = (jax.nn.gelu(gf, approximate=True) if cfg.mlp_act == "gelu"
           else jax.nn.silu(gf))
    h = (act * u.astype(jnp.float32)).astype(dt)
    return _mm(h, layer["w2"], dt, aq)


# ---------------------------------------------------------------------------
# forward / prefill / decode
# ---------------------------------------------------------------------------

def forward(
    cfg: LlamaConfig,
    params: Dict,
    tokens: Array,                    # [B, T] int32
    positions: Optional[Array] = None,  # [B, T]
    cache: Optional[KVCache] = None,  # stacked per-layer cache (see init_kv_cache)
    mask: Optional[Array] = None,     # [B, 1, T, S] additive; default causal
    attend_in_layer: bool = False,    # fresh prefill: attend over in-layer k/v
                                      # (float, causal) while still filling the cache
    logit_positions: Optional[Array] = None,  # [B] -> project lm_head only at
                                              # these positions (prefill: the
                                              # full [B,T,V] tensor is huge)
    kv_write_start: Optional[Array] = None,   # scalar: every row's KV writes
                                              # are [start, start+T) — enables
                                              # the contiguous DUS append path
    attn_window: Optional[int] = None,        # static: attend only to cache
                                              # positions < attn_window (all
                                              # positions must fit) — decode
                                              # reads the live prefix, not
                                              # max_len
) -> Tuple[Array, Optional[KVCache]]:
    """Returns (logits [B, T, V] — or [B, 1, V] with logit_positions — and
    the updated cache or None)."""
    b, t = tokens.shape
    dt = cfg.dtype
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))

    x = params["embed"][tokens].astype(dt)
    if cfg.scale_embed:  # Gemma: sqrt(d_model) normalizer, rounded in model dtype
        x = x * jnp.asarray(cfg.d_model ** 0.5, dt)
    if cfg.embed_multiplier is not None:  # Granite
        x = x * jnp.asarray(cfg.embed_multiplier, dt)

    s_len = cache.max_len if cache is not None else t
    if attn_window is not None:
        s_len = min(s_len, attn_window)

    # Deferred-append decode (t == 1): the per-layer cache scatters (4 x
    # n_layers tiny kernels, ~1.6 ms/step on 8B by knockout) collapse into
    # ONE batched scatter per buffer after the layer loop; each layer's
    # attention adds the current token's contribution from registers.
    # Requires a caller-default mask (the strict variant is built here).
    import os as _os
    defer = (t == 1 and cache is not None and not attend_in_layer
             and mask is None
             and _os.environ.get("PIQUANT_DEFER_APPEND", "1") == "1")
    pending: Optional[list] = [] if defer else None

    masks = None        # (local, full) pair for alternating-layout models
    local_period = (cfg.sliding_pattern
                    or (cfg.nope_pattern if cfg.chunk_window else None))
    # Flash prefill is sound only when the mask is one of the DEFAULT
    # families (causal / sliding / chunked — reconstructed inside the
    # kernels from per-row positions): positions are contiguous along T in
    # every prefill path, so index math reproduces build_mask exactly.
    # Caller-supplied masks fall back to the materialized-scores path.
    flash_ok = mask is None and t > 1
    if mask is None:
        def build_mask(window, chunk=None):
            if attend_in_layer or cache is None:
                qp = positions[:, None, :, None]      # [B,1,T,1] absolute
                kp = positions[:, None, None, :]      # [B,1,1,T]
                ok = kp <= qp
            else:
                # decode/prefill against cache: attention to pos <= position
                # (STRICT < in deferred mode — the current token is not in
                # the cache yet; its slot holds stale data, keep it masked)
                kp = jnp.arange(s_len, dtype=jnp.int32)[None, None, None, :]
                qp = positions[:, None, :, None]
                ok = kp < qp if defer else kp <= qp
            if window is not None:
                ok = ok & (kp > qp - window)
            if chunk is not None:  # Llama-4: block-local (kp//C == qp//C)
                ok = ok & (kp // chunk == qp // chunk)
            return jnp.where(ok, 0.0, -1e9).astype(jnp.float32)

        if local_period:
            # Gemma-2/GPT-OSS: (sliding, full); Llama-4: (chunked, full)
            local = (build_mask(cfg.sliding_window) if cfg.sliding_pattern
                     else build_mask(None, cfg.chunk_window))
            masks = (local, build_mask(None))
        elif cfg.chunk_window:  # every layer chunked (no nope layers)
            mask = build_mask(None, cfg.chunk_window)
        else:
            mask = build_mask(cfg.sliding_window)

    for i, layer in enumerate(params["layers"]):
        mk = (masks[0 if cfg.layer_is_local(i) else 1]
              if masks is not None else mask)
        h, cache = _attention(cfg, layer,
                              rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                                       cfg.norm_plus_one),
                              positions, cache, i, mk, attend_in_layer,
                              kv_write_start, attn_window, pending,
                              flash_ok=flash_ok)
        if cfg.sandwich_norms:  # Gemma-2: norm the block OUTPUTS too
            h = rms_norm(h, layer["post_attn_norm"], cfg.rms_eps,
                         cfg.norm_plus_one)
        if cfg.residual_multiplier != 1.0:  # Granite
            h = h * jnp.asarray(cfg.residual_multiplier, dt)
        x = x + h
        h = _mlp(cfg, layer, rms_norm(x, layer["mlp_norm"], cfg.rms_eps,
                                      cfg.norm_plus_one))
        if cfg.sandwich_norms:
            h = rms_norm(h, layer["post_mlp_norm"], cfg.rms_eps,
                         cfg.norm_plus_one)
        if cfg.residual_multiplier != 1.0:
            h = h * jnp.asarray(cfg.residual_multiplier, dt)
        x = x + h

    if pending:
        cache = kv_cache_append_stacked_batch(
            cache,
            jnp.stack([p[0] for p in pending]),   # [L, B, Hkv, 1, D] int8
            jnp.stack([p[1] for p in pending]),   # [L, B, Hkv, 1, 1] f32
            jnp.stack([p[2] for p in pending]),
            jnp.stack([p[3] for p in pending]),
            positions)

    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.norm_plus_one)
    if logit_positions is not None:
        x = x[jnp.arange(b), logit_positions][:, None, :]
    logits = _mm(x, params["lm_head"], jnp.float32)
    if cfg.logits_scaling != 1.0:  # Granite
        logits = logits / cfg.logits_scaling
    if cfg.final_softcap:  # Gemma-2
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits, cache


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None) -> KVCache:
    """Stacked per-layer KVCache: leaves have a leading n_layers axis."""
    ml = max_len or cfg.max_seq_len
    one = kv_cache_init(batch, cfg.n_kv_heads, ml, cfg.head_dim,
                        bits=cfg.kv_bits)
    return jax.tree.map(lambda a: jnp.stack([a] * cfg.n_layers), one)


def prefill(cfg: LlamaConfig, params: Dict, tokens: Array, cache: KVCache,
            last_positions: Optional[Array] = None) -> Tuple[Array, KVCache]:
    """Run the prompt through the model, filling the cache.  Returns logits
    at `last_positions` (default: final position) [B, V] and the cache."""
    b, t = tokens.shape
    if last_positions is None:
        last_positions = jnp.full((b,), t - 1, jnp.int32)
    logits, cache = forward(cfg, params, tokens, cache=cache,
                            attend_in_layer=True,
                            logit_positions=last_positions,
                            kv_write_start=jnp.int32(0))
    return logits[:, 0], cache


def decode_step(cfg: LlamaConfig, params: Dict, token: Array, position: Array,
                cache: KVCache, attn_window: Optional[int] = None,
                ) -> Tuple[Array, KVCache]:
    """One autoregressive step: token [B] int32, position [B] int32.
    `attn_window` (static) bounds the cache prefix attention reads."""
    logits, cache = forward(cfg, params, token[:, None],
                            positions=position[:, None], cache=cache,
                            attn_window=attn_window)
    return logits[:, 0], cache


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------

_COL_PARALLEL = ("wq", "wk", "wv", "w1", "w3", "wqkv", "w13",
                 "shared_w1", "shared_w3")
_ROW_PARALLEL = ("wo", "w2", "shared_w2")


def param_shardings(cfg: LlamaConfig, tp_axis: str = "tp",
                    params: Optional[Dict] = None,
                    ep_axis: Optional[str] = None) -> Dict:
    """PartitionSpec pytree for tensor parallelism over `tp_axis`
    (FLOAT params; for quantized params use `shard_params`).

    Column-parallel (shard N): wq/wk/wv/w1/w3; row-parallel (shard K):
    wo/w2; norms/embeddings replicated; lm_head column-sharded.
    """
    def layer_spec(layer=None):
        if layer is not None:
            keys = layer.keys()
        elif cfg.n_experts > 1:
            keys = ("wq", "wk", "wv", "wo", "router") + _MOE_QUANT_KEYS
        else:
            keys = _COL_PARALLEL[:5] + _ROW_PARALLEL
        s = {"attn_norm": P(None), "mlp_norm": P(None)}
        for k in _COL_PARALLEL:
            if k in keys:
                s[k] = P(None, tp_axis)
        for k in _ROW_PARALLEL:
            if k in keys:
                s[k] = P(tp_axis, None)
        if "router" in keys:
            s["router"] = P(None, None)
            for k in _MOE_QUANT_KEYS:
                s[k] = P(ep_axis, None, None)  # whole experts per shard
            for k in ("moe_b1", "moe_b3", "moe_b2"):
                if layer is not None and k in layer:
                    # expert-stacked biases shard with their experts — the
                    # scan in _moe_dense consumes e_local of each
                    s[k] = P(ep_axis, None)
        if layer is not None:
            for k in layer.keys():  # small per-head/gate leaves: replicate
                if k not in s and k != "fused_tp":
                    s[k] = P()
        if layer is not None:
            for k in ("bq", "bk", "bv"):
                if k in layer:
                    s[k] = P(tp_axis)
            if "fused_tp" in layer:
                s["fused_tp"] = layer["fused_tp"]  # static leaf: spec unused
        return s

    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, tp_axis),
        "layers": [layer_spec(l) for l in params["layers"]] if params
        else [layer_spec() for _ in range(cfg.n_layers)],
    }


def shard_params(params: Dict, mesh, tp_axis: str = "tp",
                 ep_axis: Optional[str] = None) -> Dict:
    """device_put the param pytree with TP shardings; handles both float
    weights and QuantizedLinear leaves.

    QuantizedLinear.data for 4-bit is [K//2, N]: the row-parallel K-shard
    splits split-half byte rows evenly because (K/2) % tp == 0 for supported
    configs; per-channel scale/zp follow the N axis (replicated for
    row-parallel layers).  MoE expert stacks shard whole experts over
    `ep_axis` (leading dim); the router stays replicated.
    """
    from jax.sharding import NamedSharding

    for layer in params.get("layers", []):
        for k, v in layer.items():
            if type(v).__name__ in ("LoraLinear", "MultiLoraLinear"):
                raise ValueError(
                    f"shard_params cannot shard {type(v).__name__} leaf "
                    f"{k!r}: merge_lora first, or serve adapters unsharded "
                    "(TP-sharded adapter stacks are not implemented)")

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_linear(w, kind):
        if isinstance(w, QuantizedLinear):
            def putq(x, spec):
                return None if x is None else put(x, spec)
            if kind == "col":
                return QuantizedLinear(
                    data=put(w.data, P(None, tp_axis)),
                    scale=put(w.scale, P(None, tp_axis)),
                    zero_point=put(w.zero_point, P(None, tp_axis)),
                    bits=w.bits, k=w.k, group_size=w.group_size,
                    s_chunk=putq(w.s_chunk, P(None, tp_axis)),
                    z_chunk=putq(w.z_chunk, P(None, tp_axis)),
                    codebook=w.codebook)
            return QuantizedLinear(
                data=put(w.data, P(tp_axis, None)),
                scale=put(w.scale, P(None, None)),
                zero_point=put(w.zero_point, P(None, None)),
                bits=w.bits, k=w.k, group_size=w.group_size,
                s_chunk=putq(w.s_chunk, P(None, None)),
                z_chunk=putq(w.z_chunk, P(None, None)),
                codebook=w.codebook)
        return put(w, P(None, tp_axis) if kind == "col" else P(tp_axis, None))

    out = {
        "embed": put(params["embed"], P(None, None)),
        "final_norm": put(params["final_norm"], P(None)),
        "lm_head": put_linear(params["lm_head"], "col")
        if isinstance(params["lm_head"], QuantizedLinear)
        else put(params["lm_head"], P(None, tp_axis)),
        "layers": [],
    }
    for layer in params["layers"]:
        nl = {"attn_norm": put(layer["attn_norm"], P(None)),
              "mlp_norm": put(layer["mlp_norm"], P(None))}
        for k in _COL_PARALLEL:
            if k in layer:
                nl[k] = put_linear(layer[k], "col")
        for k in _ROW_PARALLEL:
            if k in layer:
                nl[k] = put_linear(layer[k], "row")
        for k in ("bq", "bk", "bv"):  # qkv biases follow their columns
            if k in layer:
                nl[k] = put(layer[k], P(tp_axis))
        if "router" in layer:  # MoE: router replicated, experts EP-sharded
            from piquant_tpu.quant.linear import QuantizedExpertStack
            nl["router"] = put(layer["router"], P(None, None))
            for k in _MOE_QUANT_KEYS:
                w = layer[k]
                espec = P(ep_axis, None, None)
                if isinstance(w, QuantizedExpertStack):
                    nl[k] = QuantizedExpertStack(
                        data=put(w.data, espec),
                        scale=put(w.scale, espec),
                        zero_point=put(w.zero_point, espec),
                        bits=w.bits, k=w.k, group_size=w.group_size,
                        codebook=w.codebook)
                else:
                    nl[k] = put(w, espec)
        if "fused_tp" in layer:
            nl["fused_tp"] = layer["fused_tp"]
        for k, v in layer.items():  # remaining small leaves: replicate
            if k not in nl:
                nl[k] = put(v, P())
        out["layers"].append(nl)
    return out


def cache_shardings(cfg: LlamaConfig, tp_axis: str = "tp") -> KVCache:
    """KV cache sharded over heads (axis 1 after the stacked layer axis)."""
    return KVCache(
        k_codes=P(None, None, tp_axis, None, None),
        v_codes=P(None, None, tp_axis, None, None),
        k_scale=P(None, None, tp_axis, None, None),
        v_scale=P(None, None, tp_axis, None, None),
        length=P(None, None),
    )
