"""HF loader cross-validation: our model must reproduce transformers'
LlamaForCausalLM logits from the same weights (the strongest correctness
oracle available for the model layer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from piquant_tpu.models import llama as M
from piquant_tpu.models.loader import load_from_hf

SEED = 0x9032002


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(SEED)
    conf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(conf)
    model.eval()
    return model


def test_loaded_model_matches_transformers(hf_model):
    cfg, params = load_from_hf(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(SEED)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = hf_model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    got = np.asarray(got)

    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_loaded_model_decode_with_cache_matches_transformers(hf_model):
    cfg, params = load_from_hf(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(SEED + 1)
    tokens = rng.integers(0, cfg.vocab_size, (1, 8))

    with torch.no_grad():
        want = hf_model(torch.tensor(tokens)).logits.numpy()[:, -1]

    cache = M.init_kv_cache(cfg, 1, max_len=16)
    _, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :-1], jnp.int32), cache)
    got, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                           jnp.asarray([7], jnp.int32), cache)
    # INT8 KV cache path: small quantization error allowed
    denom = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / denom < 0.03


def test_quantized_loaded_model_stays_close(hf_model):
    cfg, params = load_from_hf(hf_model, dtype=jnp.float32, quantize_bits=4)
    cfgf, paramsf = load_from_hf(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(SEED + 2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)), jnp.int32)
    lq, _ = M.forward(cfg, params, tokens)
    lf, _ = M.forward(cfgf, paramsf, tokens)
    pq = jax.nn.log_softmax(lq[0, -1])
    pf = jax.nn.log_softmax(lf[0, -1])
    assert float(jnp.abs(pq - pf).mean()) < 0.3


def test_qwen2_family_with_biases():
    torch.manual_seed(SEED)
    conf = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    model = transformers.Qwen2ForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.qkv_bias and "bq" in params["layers"][0]
    rng = np.random.default_rng(SEED)
    tokens = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)


def test_gemma_family():
    """Gemma: RMSNorm(1+w), GeGLU, sqrt(d_model) embedding scale, tied
    lm_head, head_dim decoupled from d_model/n_heads."""
    torch.manual_seed(SEED)
    conf = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=32, max_position_embeddings=64, rope_theta=10_000.0,
        rms_norm_eps=1e-5, attn_implementation="eager",
    )
    model = transformers.GemmaForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.head_dim == 32 and cfg.norm_plus_one and cfg.mlp_act == "gelu"
    assert cfg.scale_embed
    rng = np.random.default_rng(SEED)
    tokens = rng.integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)


def test_gemma_decode_matches_prefill():
    torch.manual_seed(SEED)
    cfg = M.LlamaConfig.tiny(norm_plus_one=True, mlp_act="gelu",
                             scale_embed=True, head_dim_override=16,
                             dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(3))
    tokens = jax.random.randint(jax.random.key(4), (2, 12), 0,
                                cfg.vocab_size, jnp.int32)
    # full-sequence forward (no cache) vs prefill+decode path
    want, _ = M.forward(cfg, params, tokens)
    cache = M.init_kv_cache(cfg, 2, max_len=32)
    logits_p, cache = M.prefill(cfg, params, tokens[:, :11], cache)
    pos = jnp.full((2,), 11, jnp.int32)
    logits_d, _ = M.decode_step(cfg, params, tokens[:, 11], pos, cache)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(want[:, 10]),
                               atol=2e-3, rtol=2e-3)
    # decode uses the INT8 cache -> looser bound
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(want[:, 11]),
                               atol=0.1, rtol=0.1)


def test_mistral_sliding_window():
    """Sliding-window attention must match transformers' MistralForCausalLM
    (window small enough to bite within the test sequence)."""
    torch.manual_seed(SEED)
    conf = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        sliding_window=4, attn_implementation="eager",
    )
    model = transformers.MistralForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.sliding_window == 4
    rng = np.random.default_rng(SEED)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # decode path respects the window too (vs full forward)
    cache = M.init_kv_cache(cfg, 2, max_len=32)
    lp, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :11], jnp.int32),
                          cache)
    pos = jnp.full((2,), 11, jnp.int32)
    ld, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, 11], jnp.int32),
                          pos, cache)
    np.testing.assert_allclose(np.asarray(ld), want[:, 11], atol=0.05,
                               rtol=0.05)


def test_qwen2_sliding_window_gate():
    """Qwen2 configs carry sliding_window with use_sliding_window=False —
    the loader must not enable windowed masking for them."""
    conf = transformers.Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        sliding_window=4096, use_sliding_window=False,
    )
    from piquant_tpu.models.loader import config_from_hf

    assert config_from_hf(conf).sliding_window is None
    conf2 = transformers.MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        sliding_window=128,
    )
    assert config_from_hf(conf2).sliding_window == 128


@pytest.fixture(scope="module")
def hf_phi3():
    torch.manual_seed(SEED + 4)
    conf = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        partial_rotary_factor=0.5, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, attn_implementation="eager",
    )
    model = transformers.Phi3ForCausalLM(conf)
    model.eval()
    return model


def test_phi3_matches_transformers(hf_phi3):
    """Phi-3: fused qkv/gate_up projections + partial rotary (rotate only
    partial_rotary_factor of each head)."""
    cfg, params = load_from_hf(hf_phi3, dtype=jnp.float32)
    assert cfg.rotary_dim == cfg.head_dim // 2
    rng = np.random.default_rng(SEED + 5)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = hf_phi3(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_qwen3_matches_transformers():
    """Qwen3: per-head q/k RMSNorm (weights re-permuted with the rope
    column permutation) must reproduce transformers logits."""
    if not hasattr(transformers, "Qwen3ForCausalLM"):
        pytest.skip("transformers lacks Qwen3")
    torch.manual_seed(SEED + 8)
    conf = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rope_theta=10_000.0,
        rms_norm_eps=1e-5, attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.Qwen3ForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.qk_norm
    rng = np.random.default_rng(SEED + 9)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_real_checkpoint_pipeline_dry_run(hf_model, tmp_path):
    """BASELINE-readiness drill (VERDICT r1 #7): the full real-weights
    pipeline — HF checkpoint on DISK -> from_pretrained -> load_from_hf ->
    quantize_params -> packed-weight disk cache roundtrip -> perplexity —
    must run end to end, so the 0.1-ppl INT4 check is one command away the
    moment actual Llama weights exist.  (quality numbers quoted in
    README/PARITY remain trained-tiny-proxy until then.)"""
    from piquant_tpu.eval import perplexity
    from piquant_tpu.utils.weight_cache import load_quantized, save_quantized

    # a real on-disk checkpoint, as downloaded weights would be
    ckdir = tmp_path / "hf_ckpt"
    hf_model.save_pretrained(ckdir)
    reloaded = transformers.LlamaForCausalLM.from_pretrained(ckdir)
    reloaded.eval()

    cfg, params = load_from_hf(reloaded, dtype=jnp.float32)
    qp = M.quantize_params(params, bits=4)
    save_quantized(str(tmp_path / "packed"), qp)
    qp = load_quantized(str(tmp_path / "packed"))

    rng = np.random.default_rng(SEED + 40)
    text = list(map(int, rng.integers(0, cfg.vocab_size, 96)))
    ppl_f = perplexity(cfg, params, text, window=48, stride=24)
    ppl_q = perplexity(cfg, qp, text, window=48, stride=24)
    assert np.isfinite(ppl_f) and np.isfinite(ppl_q)
    # random-init tiny model: ppl ~ vocab_size; int4 stays in the same range
    assert abs(np.log(ppl_q) - np.log(ppl_f)) < 0.5, (ppl_f, ppl_q)


def test_gemma2_loader_matches_transformers():
    """Gemma-2: sandwich norms (post-attention/post-feedforward on block
    OUTPUTS), attn + final logit softcapping, query_pre_attn_scalar score
    scale, alternating sliding/full attention — cross-validated against
    transformers Gemma2ForCausalLM with a sliding window small enough to
    actually clip the test sequence."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Gemma2ForCausalLM"):
        pytest.skip("transformers lacks Gemma2")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(77)
    conf = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=24,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=6, max_position_embeddings=64,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.Gemma2ForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.sandwich_norms and cfg.sliding_pattern == 2
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert abs(cfg.attn_scale_override - 24 ** -0.5) < 1e-9
    assert "post_attn_norm" in params["layers"][0]

    rng = np.random.default_rng(78)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))  # > sliding_window

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)

    # greedy decode through the cached path matches the forward argmax at
    # the last position (sliding/full alternation in decode masks)
    cache = M.init_kv_cache(cfg, 2, max_len=16)
    lg, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :-1], jnp.int32),
                          cache)
    step, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 11, jnp.int32), cache)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_gpt_oss_loader_matches_transformers():
    """GPT-OSS: attention sinks (softmax-denominator logit), biases on all
    projections + router + experts, interleaved fused gate_up split,
    clamped-swiglu MoE ((up+1)*gate*sigmoid(1.702*gate)), alternating
    sliding/full layers, YaRN rope — cross-validated against transformers
    GptOssForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "GptOssForCausalLM"):
        pytest.skip("transformers lacks GptOss")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(81)
    conf = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=6, max_position_embeddings=64,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.GptOssForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.attn_sinks and cfg.moe_clamp_swiglu and cfg.router_bias
    assert cfg.o_bias and cfg.qkv_bias and cfg.moe_bias
    assert cfg.sliding_pattern == 2 and cfg.sliding_window == 6
    assert cfg.yarn is not None and cfg.yarn.factor == 32.0
    assert not cfg.yarn.truncate
    lyr = params["layers"][0]
    assert lyr["moe_w1"].shape == (4, 64, 48) and lyr["sinks"].shape == (4,)

    rng = np.random.default_rng(82)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))  # > sliding_window

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # cached decode path (sinks + sliding alternation in decode masks)
    cache = M.init_kv_cache(cfg, 2, max_len=16)
    lg, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :-1], jnp.int32),
                          cache)
    step, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 11, jnp.int32), cache)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_llama4_loader_matches_transformers():
    """Llama-4: interleaved MoE/dense layers, input-scaled sigmoid top-k
    routing, ungated shared expert, nope layers (no rope + temperature
    tuning + full attention) alternating with chunked-attention rope
    layers, weightless L2 qk-norm — cross-validated against transformers
    Llama4ForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Llama4ForCausalLM"):
        pytest.skip("transformers lacks Llama4")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(91)
    conf = transformers.Llama4TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48,
        intermediate_size_mlp=80, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2, attention_chunk_size=8,
        max_position_embeddings=64, rope_scaling=None,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.Llama4ForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.moe_input_scaled and not cfg.shared_expert_gated
    assert cfg.nope_pattern == 4 and cfg.chunk_window == 8
    assert cfg.qk_l2norm and cfg.attn_temp_tuning and cfg.rope_interleaved
    assert cfg.moe_every == 2 and cfg.d_ff == 80 and cfg.moe_d_ff == 48
    assert "router" in params["layers"][1] and "w1" in params["layers"][0]
    assert "shared_gate" not in params["layers"][1]

    rng = np.random.default_rng(92)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))  # > chunk size

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # cached decode (chunked/full alternation + nope temperature in decode)
    cache = M.init_kv_cache(cfg, 2, max_len=16)
    lg, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :-1], jnp.int32),
                          cache)
    step, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 11, jnp.int32), cache)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_llama31_rope_scaling_matches_transformers():
    """Llama-3.1 rope scaling (low-freq /factor, smooth mid-band) —
    cross-validated against transformers LlamaForCausalLM with
    rope_scaling rope_type=llama3."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(95)
    conf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10_000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
        rms_norm_eps=1e-5, pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.llama3_rope is not None and cfg.llama3_rope.factor == 8.0

    rng = np.random.default_rng(96)
    tokens = rng.integers(0, cfg.vocab_size, (2, 40))  # > original_max/2

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_gemma3_loader_matches_transformers():
    """Gemma-3: dual rope bases (local 10k on sliding layers, global theta
    with linear scaling on full layers), 5:1 sliding/full layout, qk
    RMSNorm with the Gemma (1+w) convention, sandwich norms —
    cross-validated against transformers Gemma3ForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Gemma3ForCausalLM"):
        pytest.skip("transformers lacks Gemma3")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(101)
    conf = transformers.Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=24, sliding_window=6,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        max_position_embeddings=64, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.Gemma3ForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.sliding_pattern == 6 and cfg.qk_norm and cfg.sandwich_norms
    assert cfg.rope_theta_local == 10_000.0
    assert cfg.rope_linear_factor == 8.0 and cfg.norm_plus_one

    rng = np.random.default_rng(102)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))  # > sliding_window

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # cached decode (dual-rope + 5:1 alternation in decode masks)
    cache = M.init_kv_cache(cfg, 2, max_len=16)
    lg, cache = M.prefill(cfg, params, jnp.asarray(tokens[:, :-1], jnp.int32),
                          cache)
    step, _ = M.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 11, jnp.int32), cache)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_load_from_hf_quant_methods():
    """loader method= dispatch: rtn / awq / gptq / awq+gptq all produce a
    servable quantized pytree from a HF model; calibration validation."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from piquant_tpu.models.loader import load_from_hf
    from piquant_tpu.models import llama as M

    torch.manual_seed(55)
    conf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False)
    model = transformers.LlamaForCausalLM(conf)
    model.eval()
    rng = np.random.default_rng(56)
    calib = rng.integers(0, 128, (2, 24))
    toks = jnp.asarray(rng.integers(0, 128, (1, 8)), jnp.int32)

    with torch.no_grad():
        want = model(torch.tensor(np.asarray(toks))).logits.numpy()

    for method in ("rtn", "awq", "gptq", "awq+gptq"):
        cfg, params = load_from_hf(model, dtype=jnp.float32, quantize_bits=4,
                                   group_size=32, method=method,
                                   calib_tokens=calib)
        got, _ = M.forward(cfg, params, toks)
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 0.15, (method, rel)  # int4-g32 stays close to float

    with pytest.raises(ValueError, match="calib_tokens"):
        load_from_hf(model, quantize_bits=4, method="gptq")
    with pytest.raises(ValueError, match="unknown"):
        load_from_hf(model, quantize_bits=4, method="hqq")


def test_granite_loader_matches_transformers():
    """Granite: four fixed scalar multipliers (embedding, residual,
    attention, logits) over the llama topology."""
    if not hasattr(transformers, "GraniteForCausalLM"):
        pytest.skip("transformers lacks Granite")
    torch.manual_seed(SEED + 60)
    conf = transformers.GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.03, logits_scaling=8.0,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    model = transformers.GraniteForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.embed_multiplier == 12.0 and cfg.logits_scaling == 8.0
    assert cfg.residual_multiplier == 0.22
    assert cfg.attn_scale_override == 0.03
    rng = np.random.default_rng(SEED + 61)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_smollm3_loader_matches_transformers():
    """SmolLM3: llama + NoPE on every no_rope_layer_interval-th layer
    (maps onto the existing nope_pattern machinery)."""
    if not hasattr(transformers, "SmolLM3ForCausalLM"):
        pytest.skip("transformers lacks SmolLM3")
    torch.manual_seed(SEED + 62)
    conf = transformers.SmolLM3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        no_rope_layers=[1, 1, 1, 0], no_rope_layer_interval=4,
        attn_implementation="eager", tie_word_embeddings=False,
        use_sliding_window=False, pad_token_id=0,
    )
    model = transformers.SmolLM3ForCausalLM(conf)
    model.eval()
    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.nope_pattern == 4
    assert (cfg.layer_uses_rope(0) and cfg.layer_uses_rope(2)
            and not cfg.layer_uses_rope(3))
    rng = np.random.default_rng(SEED + 63)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_load_fused_matches_unfused(hf_model):
    """load_from_hf(fuse=True): wqkv/w13 projection fusion at load time
    (r5: -4% decode ms/step) must be numerically identical to the
    unfused load, quantized and float."""
    cfg, pu = load_from_hf(hf_model, dtype=jnp.float32, quantize_bits=4)
    cfg2, pf = load_from_hf(hf_model, dtype=jnp.float32, quantize_bits=4,
                            fuse=True)
    assert "wqkv" in pf["layers"][0] and "wq" not in pf["layers"][0]
    rng = np.random.default_rng(SEED + 4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    yu, _ = M.forward(cfg, pu, tokens)
    yf, _ = M.forward(cfg2, pf, tokens)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               atol=2e-5, rtol=2e-5)
