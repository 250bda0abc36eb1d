"""HF Llama checkpoint loader -> piquant-tpu param pytree.

Maps a `transformers` LlamaForCausalLM state dict into the functional model
(models/llama.py), with optional on-load weight quantization (host-side via
the native runtime when available — packing an 8B checkpoint is exactly the
reference's hot path, run through csrc at load time).

RoPE convention: HF applies rotate-half (splits the head dim in two);
models/llama.py rotates interleaved (even, odd) pairs.  The two are
equivalent under a fixed permutation of the head dimension, folded into the
q/k projection weights here at load time (the GPT-NeoX permutation trick) —
so no per-step permute cost on device.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from piquant_tpu.models.llama import LlamaConfig


def config_from_hf(hf_config: Any, dtype=jnp.bfloat16) -> LlamaConfig:
    mtype = getattr(hf_config, "model_type", "")
    is_gemma3 = mtype in ("gemma3", "gemma3_text")
    is_gemma = mtype in ("gemma", "gemma2") or is_gemma3
    is_gemma2 = mtype == "gemma2" or is_gemma3  # sandwich-norm generation
    is_gpt_oss = mtype == "gpt_oss"
    is_llama4 = mtype in ("llama4_text", "llama4")
    is_granite = mtype == "granite"
    # SmolLM3: llama + NoPE every `no_rope_layer_interval`-th layer
    # (no_rope_layers[i] == 0 => layer i skips rope, at (i+1) % p == 0)
    smollm3_nope = None
    if mtype == "smollm3":
        nrl = list(getattr(hf_config, "no_rope_layers", []) or [])
        p0 = int(getattr(hf_config, "no_rope_layer_interval", 0) or 0)
        if nrl:
            zeros = [i for i, v in enumerate(nrl) if not v]
            if zeros:
                p0 = zeros[0] + 1
                if any((i + 1) % p0 != 0 for i in zeros) or (
                        len(zeros) != len(nrl) // p0):
                    raise ValueError(
                        f"irregular smollm3 no_rope_layers: {nrl}")
        smollm3_nope = p0 or None
    default_hd = hf_config.hidden_size // hf_config.num_attention_heads
    hd = getattr(hf_config, "head_dim", default_hd) or default_hd
    qpas = getattr(hf_config, "query_pre_attn_scalar", None)
    yarn = None
    llama3_rope = None
    rs = getattr(hf_config, "rope_scaling", None)
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        from piquant_tpu.models.llama import Llama3Rope
        llama3_rope = Llama3Rope(
            factor=rs["factor"],
            low_freq_factor=rs.get("low_freq_factor", 1.0),
            high_freq_factor=rs.get("high_freq_factor", 4.0),
            original_max_position_embeddings=rs.get(
                "original_max_position_embeddings", 8192),
        )
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        from piquant_tpu.models.llama import YarnRope
        yarn = YarnRope(
            factor=rs["factor"],
            original_max_position_embeddings=rs.get(
                "original_max_position_embeddings",
                hf_config.max_position_embeddings),
            beta_fast=rs.get("beta_fast") or 32.0,
            beta_slow=rs.get("beta_slow") or 1.0,
            attention_factor=rs.get("attention_factor"),
            truncate=bool(rs.get("truncate", True)),
        )
    # alternating sliding/full layout (Gemma-2, GPT-OSS): period of the
    # layer_types list when it alternates, else None
    if is_gemma3:
        sliding_pattern = getattr(hf_config, "sliding_window_pattern",
                                  None) or 6
    elif is_gemma2:
        sliding_pattern = 2
    else:
        sliding_pattern = None
    lt = getattr(hf_config, "layer_types", None)
    if lt and "sliding_attention" in lt and "full_attention" in lt:
        # full-attention layers at (li+1) % p == 0 for some period p
        fulls = [i for i, t in enumerate(lt) if t == "full_attention"]
        p0 = fulls[0] + 1
        if all((i + 1) % p0 == 0 for i in fulls) and len(fulls) == len(lt) // p0:
            sliding_pattern = p0
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        d_ff=(getattr(hf_config, "intermediate_size_mlp", None)
              if is_llama4 else None) or hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10_000.0),
        rms_eps=getattr(hf_config, "rms_norm_eps", 1e-5),
        max_seq_len=getattr(hf_config, "max_position_embeddings", 8192),
        qkv_bias=bool(getattr(hf_config, "attention_bias", False)
                      or mtype in ("qwen2", "qwen2_moe", "gpt_oss")),
        head_dim_override=hd if hd != default_hd else None,
        # e.g. Qwen2 configs carry sliding_window=4096 with
        # use_sliding_window=False — honor the gate
        sliding_window=(getattr(hf_config, "sliding_window", None)
                        if getattr(hf_config, "use_sliding_window", True)
                        else None),
        norm_plus_one=is_gemma,   # Gemma RMSNorm: x_norm * (1 + w)
        mlp_act="gelu" if is_gemma else "silu",
        scale_embed=is_gemma,     # Gemma: embeddings * sqrt(d_model)
        # Gemma-2: sandwich norms, logit softcaps, query_pre_attn_scalar
        # score scale, alternating sliding/full attention (period 2)
        sandwich_norms=is_gemma2,
        attn_softcap=getattr(hf_config, "attn_logit_softcapping", None)
        if is_gemma2 else None,
        final_softcap=getattr(hf_config, "final_logit_softcapping", None)
        if is_gemma2 else None,
        attn_scale_override=(qpas ** -0.5 if is_gemma2 and qpas
                             else float(hf_config.attention_multiplier)
                             if is_granite else None),
        rope_theta_local=(getattr(hf_config, "rope_local_base_freq", None)
                          if is_gemma3 else None),
        rope_linear_factor=(
            rs["factor"] if is_gemma3 and rs
            and rs.get("rope_type", rs.get("type")) == "linear" else None),
        sliding_pattern=sliding_pattern,
        # GPT-OSS: sinks, biases everywhere, clamped swiglu, yarn
        attn_sinks=is_gpt_oss,
        o_bias=is_gpt_oss,
        router_bias=is_gpt_oss,
        moe_bias=is_gpt_oss,
        moe_clamp_swiglu=is_gpt_oss,
        yarn=yarn,
        llama3_rope=llama3_rope,
        # Llama-4: interleaved-native rope, nope layers with temperature
        # tuning + full attention, chunked attention elsewhere, input-scaled
        # sigmoid top-k routing, ungated shared expert, interleaved MoE
        rope_interleaved=is_llama4,
        qk_l2norm=bool(is_llama4 and getattr(hf_config, "use_qk_norm", False)),
        nope_pattern=(_llama4_nope_pattern(hf_config) if is_llama4
                      else smollm3_nope),
        # Granite: four fixed scalar multipliers over the llama topology
        embed_multiplier=(float(hf_config.embedding_multiplier)
                          if is_granite else None),
        residual_multiplier=(float(hf_config.residual_multiplier)
                             if is_granite else 1.0),
        logits_scaling=(float(hf_config.logits_scaling)
                        if is_granite else 1.0),
        attn_temp_tuning=bool(
            is_llama4 and getattr(hf_config, "attn_temperature_tuning", False)),
        floor_scale=float(getattr(hf_config, "floor_scale", 8192.0)),
        temp_attn_scale=float(getattr(hf_config, "attn_scale", 0.1)),
        chunk_window=(getattr(hf_config, "attention_chunk_size", None)
                      if is_llama4 else None),
        moe_every=(getattr(hf_config, "interleave_moe_layer_step", None)
                   if is_llama4 else None),
        moe_input_scaled=is_llama4,
        shared_expert_gated=not is_llama4,
        # Phi family: rotate only partial_rotary_factor of the head dim
        rotary_dim_override=(
            int(hf_config.partial_rotary_factor * hd)
            if getattr(hf_config, "partial_rotary_factor", 1.0) != 1.0
            else None),
        # Mixtral / Qwen2-MoE
        n_experts=(getattr(hf_config, "num_local_experts", 0)
                   or getattr(hf_config, "num_experts", 0) or 0),
        moe_top_k=getattr(hf_config, "num_experts_per_tok", 2) or 2,
        moe_d_ff=(getattr(hf_config, "moe_intermediate_size", None)
                  or (hf_config.intermediate_size
                      if is_gpt_oss or is_llama4 else None)),
        shared_expert_d_ff=(hf_config.intermediate_size if is_llama4 else
                            getattr(hf_config,
                                    "shared_expert_intermediate_size", None)),
        moe_renormalize=bool(getattr(hf_config, "norm_topk_prob", True)),
        # per-head RMSNorm on q/k before rope
        qk_norm=mtype in ("qwen3", "qwen3_moe") or is_gemma3,
        dtype=dtype,
    )


def _llama4_nope_pattern(hf_config) -> Optional[int]:
    """Derive the nope period from no_rope_layers (1 = rope, 0 = nope).
    Raises for layouts the periodic nope_pattern cannot represent rather
    than silently corrupting the rope/mask assignment."""
    nrl = getattr(hf_config, "no_rope_layers", None)
    if not nrl:
        return int(getattr(hf_config, "no_rope_layer_interval", None) or 4)
    nope = [i for i, use_rope in enumerate(nrl) if not use_rope]
    if not nope:
        return None  # all layers rope
    period = nope[0] + 1
    expect = [i for i in range(len(nrl)) if (i + 1) % period == 0]
    if nope != expect:
        raise ValueError(f"no_rope_layers {nrl} is not periodic; "
                         "unsupported Llama-4 rope layout")
    return period


def _half_to_interleaved_perm(head_dim: int) -> np.ndarray:
    """Permutation p with interleaved[j] = half[p[j]]:
    (2i) <- i, (2i+1) <- i + head_dim//2."""
    h = head_dim // 2
    p = np.empty(head_dim, np.int64)
    p[0::2] = np.arange(h)
    p[1::2] = np.arange(h) + h
    return p


def _permute_rope_cols(w: np.ndarray, n_heads: int, head_dim: int,
                       rotary_dim: Optional[int] = None) -> np.ndarray:
    """w: [d_model, n_heads*head_dim] (already transposed); permute each
    head's columns from half-rotation order to interleaved order.  With
    partial rotary (Phi), only the first rotary_dim columns per head
    rotate — the rest stay in place."""
    rd = rotary_dim or head_dim
    p = np.arange(head_dim, dtype=np.int64)
    p[:rd] = _half_to_interleaved_perm(rd)
    w = w.reshape(w.shape[0], n_heads, head_dim)
    return w[:, :, p].reshape(w.shape[0], n_heads * head_dim)


def params_from_state_dict(state_dict: Dict[str, Any], cfg: LlamaConfig) -> Dict:
    """torch state dict (CPU tensors or numpy) -> piquant-tpu pytree."""

    def npy(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu")
            if t.dtype not in (  # torch bf16 has no numpy; go through f32
                    getattr(__import__("torch"), "float32"),
                    getattr(__import__("torch"), "float64")):
                t = t.float()
            t = t.numpy()
        return np.asarray(t)

    def lin(name):
        # torch Linear stores [out, in]; our matmul wants [in, out]
        return npy(name).T

    dt = cfg.dtype
    hd = cfg.head_dim
    params: Dict[str, Any] = {
        "embed": jnp.asarray(npy("model.embed_tokens.weight"), dt),
        "final_norm": jnp.asarray(npy("model.norm.weight"), dt),
        "layers": [],
    }
    if "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(lin("lm_head.weight"), dt)
    else:  # tied embeddings
        params["lm_head"] = jnp.asarray(npy("model.embed_tokens.weight").T, dt)

    rd = cfg.rotary_dim
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        if pre + "self_attn.qkv_proj.weight" in state_dict:
            # Phi-3: fused [q; k; v] rows -> split along the output dim
            qkv = lin(pre + "self_attn.qkv_proj.weight")
            nq = cfg.n_heads * hd
            nkv = cfg.n_kv_heads * hd
            wq_raw, wk_raw = qkv[:, :nq], qkv[:, nq:nq + nkv]
            wv = qkv[:, nq + nkv:]
        else:
            wq_raw = lin(pre + "self_attn.q_proj.weight")
            wk_raw = lin(pre + "self_attn.k_proj.weight")
            wv = lin(pre + "self_attn.v_proj.weight")
        if cfg.rope_interleaved:  # Llama-4: checkpoint already interleaved
            wq, wk = wq_raw, wk_raw
        else:
            wq = _permute_rope_cols(wq_raw, cfg.n_heads, hd, rd)
            wk = _permute_rope_cols(wk_raw, cfg.n_kv_heads, hd, rd)
        if pre + "pre_feedforward_layernorm.weight" in state_dict:
            # Gemma-2 sandwich norms: post_attention_layernorm norms the
            # attention OUTPUT (not the MLP input as in Llama)
            pre_mlp_norm = npy(pre + "pre_feedforward_layernorm.weight")
        else:
            pre_mlp_norm = npy(pre + "post_attention_layernorm.weight")
        layer: Dict[str, Any] = {
            "attn_norm": jnp.asarray(npy(pre + "input_layernorm.weight"), dt),
            "mlp_norm": jnp.asarray(pre_mlp_norm, dt),
            "wq": jnp.asarray(wq, dt),
            "wk": jnp.asarray(wk, dt),
            "wv": jnp.asarray(wv, dt),
            "wo": jnp.asarray(lin(pre + "self_attn.o_proj.weight"), dt),
        }
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = jnp.asarray(
                npy(pre + "post_attention_layernorm.weight"), dt)
            layer["post_mlp_norm"] = jnp.asarray(
                npy(pre + "post_feedforward_layernorm.weight"), dt)
        if cfg.o_bias and pre + "self_attn.o_proj.bias" in state_dict:
            layer["bo"] = jnp.asarray(npy(pre + "self_attn.o_proj.bias"), dt)
        if cfg.attn_sinks:
            layer["sinks"] = jnp.asarray(npy(pre + "self_attn.sinks"),
                                         jnp.float32)
        if pre + "mlp.router.weight" in state_dict:
            # GPT-OSS: router with bias; experts store fused [E, D, 2F]
            # gate_up with INTERLEAVED gate/up columns + per-expert biases;
            # weights are already [din, dout] (not nn.Linear) — no .T
            layer["router"] = jnp.asarray(lin(pre + "mlp.router.weight"), dt)
            layer["router_b"] = jnp.asarray(npy(pre + "mlp.router.bias"),
                                            jnp.float32)
            gu = npy(pre + "mlp.experts.gate_up_proj")        # [E, D, 2F]
            gub = npy(pre + "mlp.experts.gate_up_proj_bias")  # [E, 2F]
            layer["moe_w1"] = jnp.asarray(gu[:, :, 0::2], dt)
            layer["moe_w3"] = jnp.asarray(gu[:, :, 1::2], dt)
            layer["moe_b1"] = jnp.asarray(gub[:, 0::2], jnp.float32)
            layer["moe_b3"] = jnp.asarray(gub[:, 1::2], jnp.float32)
            layer["moe_w2"] = jnp.asarray(npy(pre + "mlp.experts.down_proj"), dt)
            layer["moe_b2"] = jnp.asarray(
                npy(pre + "mlp.experts.down_proj_bias"), jnp.float32)
        elif pre + "feed_forward.router.weight" in state_dict:
            # Llama-4: fused [E, D, 2F] gate_up with CONTIGUOUS halves
            # (torch .chunk(2, dim=-1)); ungated shared expert
            layer["router"] = jnp.asarray(
                lin(pre + "feed_forward.router.weight"), dt)
            gu = npy(pre + "feed_forward.experts.gate_up_proj")  # [E, D, 2F]
            f = gu.shape[-1] // 2
            layer["moe_w1"] = jnp.asarray(gu[:, :, :f], dt)
            layer["moe_w3"] = jnp.asarray(gu[:, :, f:], dt)
            layer["moe_w2"] = jnp.asarray(
                npy(pre + "feed_forward.experts.down_proj"), dt)
            sh = pre + "feed_forward.shared_expert."
            layer["shared_w1"] = jnp.asarray(lin(sh + "gate_proj.weight"), dt)
            layer["shared_w3"] = jnp.asarray(lin(sh + "up_proj.weight"), dt)
            layer["shared_w2"] = jnp.asarray(lin(sh + "down_proj.weight"), dt)
        elif pre + "feed_forward.gate_proj.weight" in state_dict:
            # Llama-4 dense (non-MoE interleave) layer
            layer["w1"] = jnp.asarray(lin(pre + "feed_forward.gate_proj.weight"), dt)
            layer["w3"] = jnp.asarray(lin(pre + "feed_forward.up_proj.weight"), dt)
            layer["w2"] = jnp.asarray(lin(pre + "feed_forward.down_proj.weight"), dt)
        elif pre + "mlp.gate.weight" in state_dict:
            # Qwen2-MoE: router + experts under mlp., plus a shared expert
            # with a sigmoid gate.  Layers may also be plain dense
            # (decoder_sparse_step / mlp_only_layers) — detected per layer.
            layer["router"] = jnp.asarray(lin(pre + "mlp.gate.weight"), dt)
            ep = pre + "mlp.experts."
            ne = cfg.n_experts
            layer["moe_w1"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.gate_proj.weight") for e in range(ne)]), dt)
            layer["moe_w3"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.up_proj.weight") for e in range(ne)]), dt)
            layer["moe_w2"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.down_proj.weight") for e in range(ne)]), dt)
            sh = pre + "mlp.shared_expert."
            if sh + "gate_proj.weight" in state_dict:
                # Qwen2-MoE: always-on shared expert behind a sigmoid gate.
                # Qwen3-MoE uses the same router/experts layout with NO
                # shared expert — these keys are simply absent.
                layer["shared_w1"] = jnp.asarray(lin(sh + "gate_proj.weight"), dt)
                layer["shared_w3"] = jnp.asarray(lin(sh + "up_proj.weight"), dt)
                layer["shared_w2"] = jnp.asarray(lin(sh + "down_proj.weight"), dt)
                layer["shared_gate"] = jnp.asarray(
                    lin(pre + "mlp.shared_expert_gate.weight"), dt)
        elif pre + "block_sparse_moe.gate.weight" in state_dict:
            # Mixtral MoE: router + per-expert w1 (gate), w3 (up), w2 (down)
            layer["router"] = jnp.asarray(
                lin(pre + "block_sparse_moe.gate.weight"), dt)
            ep = pre + "block_sparse_moe.experts."
            layer["moe_w1"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.w1.weight") for e in range(cfg.n_experts)]), dt)
            layer["moe_w3"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.w3.weight") for e in range(cfg.n_experts)]), dt)
            layer["moe_w2"] = jnp.asarray(np.stack(
                [lin(f"{ep}{e}.w2.weight") for e in range(cfg.n_experts)]), dt)
        else:
            if pre + "mlp.gate_up_proj.weight" in state_dict:
                # Phi-3: fused [gate; up]
                gu = lin(pre + "mlp.gate_up_proj.weight")
                w1, w3 = gu[:, :cfg.d_ff], gu[:, cfg.d_ff:]
            else:
                w1 = lin(pre + "mlp.gate_proj.weight")
                w3 = lin(pre + "mlp.up_proj.weight")
            layer["w1"] = jnp.asarray(w1, dt)
            layer["w3"] = jnp.asarray(w3, dt)
            layer["w2"] = jnp.asarray(lin(pre + "mlp.down_proj.weight"), dt)
        params["layers"].append(layer)
        if cfg.qk_norm:
            # per-head norm weights follow the same head-dim permutation
            # folded into wq/wk (rms over the head dim is permutation-
            # invariant, so only the elementwise weight needs reordering)
            pn = np.arange(hd)
            pn[:rd] = _half_to_interleaved_perm(rd)
            layer["q_norm"] = jnp.asarray(
                npy(pre + "self_attn.q_norm.weight")[pn], dt)
            layer["k_norm"] = jnp.asarray(
                npy(pre + "self_attn.k_norm.weight")[pn], dt)
        if cfg.qkv_bias:
            # biases get the same head-dim permutation as their projections
            layer = params["layers"][-1]
            layer["bq"] = jnp.asarray(_permute_rope_cols(
                npy(pre + "self_attn.q_proj.bias")[None, :], cfg.n_heads, hd)[0], dt)
            layer["bk"] = jnp.asarray(_permute_rope_cols(
                npy(pre + "self_attn.k_proj.bias")[None, :], cfg.n_kv_heads, hd)[0], dt)
            layer["bv"] = jnp.asarray(npy(pre + "self_attn.v_proj.bias"), dt)
    return params


def load_from_hf(model_or_path, dtype=jnp.bfloat16,
                 quantize_bits: Optional[int] = None,
                 *,
                 group_size: Optional[int] = None,
                 method: str = "rtn",
                 calib_tokens=None,
                 fuse: bool = False,
                 tp: int = 1) -> Tuple[LlamaConfig, Dict]:
    """Load from a transformers model instance or a local path.

    `method` selects the weight quantizer when `quantize_bits` is set:
      "rtn"       round-to-nearest (default; no calibration needed)
      "awq"       activation-aware norm-folded scaling (quant/awq.py)
      "gptq"      Hessian-compensated rounding (quant/gptq.py)
      "awq+gptq"  AWQ fold first, then GPTQ on the scaled weights —
                  the recommended INT2/INT3 recipe
      "rotate"    QuaRot-style orthogonal residual-stream rotation
                  (quant/rotate.py) absorbed offline — composable as a
                  prefix, e.g. "rotate+gptq" (no calibration needed for
                  the rotation itself)
      "smooth"    SmoothQuant outlier migration (quant/smooth.py) — for
                  the act-quant (W8A8/W4A8) paths; composable like awq,
                  e.g. "smooth+gptq"
    awq/gptq/smooth need `calib_tokens` ([B, T] int token ids) and a
    dense (non-MoE) model.

    `fuse=True` fuses wq/wk/wv -> wqkv and w1/w3 -> w13 after
    quantization (7 -> 4 projections/layer; r5 measured -4% decode
    ms/step on INT4 8B: 9.26 -> 8.88).  Pass `tp` when the params will
    be tensor-parallel-sharded so the fused columns interleave per
    shard.  Skip fuse when adding LoRA adapters afterwards (merge_lora
    first)."""
    if isinstance(model_or_path, str):
        from transformers import AutoModelForCausalLM

        model_or_path = AutoModelForCausalLM.from_pretrained(model_or_path)
    cfg = config_from_hf(model_or_path.config, dtype)
    params = params_from_state_dict(model_or_path.state_dict(), cfg)
    if quantize_bits is not None:
        steps = method.split("+")
        if (not steps or len(set(steps)) != len(steps)
                or any(s not in ("rtn", "rotate", "awq", "gptq", "smooth")
                       for s in steps)
                or ("rtn" in steps and len(steps) > 1 + ("rotate" in steps))):
            raise ValueError(f"unknown quantization method {method!r}")
        if (any(s in steps for s in ("awq", "gptq", "smooth"))
                and calib_tokens is None):
            raise ValueError(f"method={method!r} needs calib_tokens")
        from piquant_tpu.models.llama import quantize_params

        if "rotate" in steps:
            from piquant_tpu.quant.rotate import rotate_params

            params = rotate_params(cfg, params)
        if "smooth" in steps:
            from piquant_tpu.quant.awq import collect_activation_stats
            from piquant_tpu.quant.smooth import apply_smooth_scales

            stats = collect_activation_stats(cfg, params, calib_tokens,
                                             stat="absmax")
            params = apply_smooth_scales(cfg, params, stats)
        if "awq" in steps:
            from piquant_tpu.quant.awq import (apply_awq_scales,
                                               collect_activation_stats)

            stats = collect_activation_stats(cfg, params, calib_tokens)
            params = apply_awq_scales(cfg, params, stats, quantize_bits,
                                      group_size=group_size)
        if "gptq" in steps:
            from piquant_tpu.quant.gptq import gptq_quantize_params

            params = gptq_quantize_params(cfg, params, calib_tokens,
                                          quantize_bits,
                                          group_size=group_size)
        else:
            params = quantize_params(params, bits=quantize_bits,
                                     group_size=group_size)
    if fuse:
        from piquant_tpu.models.llama import fuse_layer_projections

        params = fuse_layer_projections(params, cfg, tp=tp)
    return cfg, params
