"""MLA (DeepSeek-V2-style latent attention): transformers cross-validation,
absorbed-decode == full-forward consistency, INT8 latent cache, memory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import mla as L

SEED = 0x9032002


def test_mla_forward_and_absorbed_decode_consistency():
    """decode_step (absorbed weights + INT8 latent cache) must reproduce
    the full materialized-KV forward logits at the same position, up to the
    latent-quantization error."""
    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(SEED)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)

    full, _ = L.forward(cfg, params, toks)

    cache = L.init_latent_cache(cfg, 2, max_len=16)
    _, cache = L.forward(cfg, params, toks[:, :-1], cache=cache)
    got, cache = L.decode_step(cfg, params, toks[:, -1],
                               jnp.full((2,), 8, jnp.int32), cache)
    want = np.asarray(full[:, -1])
    denom = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / denom < 0.03
    assert int(cache.length[0, 0]) == 9


def test_mla_quantized_params():
    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.key(1))
    qp = L.quantize_params(params, bits=8)
    rng = np.random.default_rng(SEED + 1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    yf, _ = L.forward(cfg, params, toks)
    yq, _ = L.forward(cfg, qp, toks)
    denom = np.abs(np.asarray(yf)).max()
    assert np.abs(np.asarray(yq) - np.asarray(yf)).max() / denom < 0.05


def test_mla_cache_memory_is_latent_sized():
    """The whole point: cache bytes per position = R (int8) + scale +
    rope_dim (bf16), independent of n_heads * head_dim."""
    cfg = L.MLAConfig.tiny()
    cache = L.init_latent_cache(cfg, batch=1, max_len=8)
    per_pos = (cache.c_codes.nbytes + cache.c_scale.nbytes
               + cache.k_pe.nbytes) / (cfg.n_layers * 8)
    dense_per_pos = 2 * cfg.n_heads * cfg.v_head_dim  # int8 dense K+V
    assert per_pos < dense_per_pos, (per_pos, dense_per_pos)


def test_mla_matches_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "DeepseekV2ForCausalLM"):
        pytest.skip("transformers lacks DeepseekV2")

    torch.manual_seed(SEED + 2)
    conf = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=64,
        first_k_dense_replace=99, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.DeepseekV2ForCausalLM(conf)
    model.eval()

    cfg, params = L.params_from_hf(model, dtype=jnp.float32)
    rng = np.random.default_rng(SEED + 3)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = L.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_mla_q_lora_matches_transformers():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "DeepseekV2ForCausalLM"):
        pytest.skip("transformers lacks DeepseekV2")

    torch.manual_seed(SEED + 4)
    conf = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=64,
        first_k_dense_replace=99, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.DeepseekV2ForCausalLM(conf)
    model.eval()

    cfg, params = L.params_from_hf(model, dtype=jnp.float32)
    assert cfg.q_lora_rank == 24
    rng = np.random.default_rng(SEED + 5)
    tokens = rng.integers(0, cfg.vocab_size, (1, 8))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()
    got, _ = L.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_mla_tp_sharded_forward_matches_single():
    """Head-sharded MLA forward on the virtual mesh == single device.
    kv_b is column-sharded over heads; the latent path replicates."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("tp",))

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.key(7))
    rng = np.random.default_rng(SEED + 9)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    want, _ = L.forward(cfg, params, toks)

    specs = L.param_shardings(cfg, params)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)

    @jax.jit
    def run(p, t):
        return L.forward(cfg, p, t)[0]

    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        got = run(sharded, jax.device_put(toks, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_mla_generate_matches_stepwise():
    """generate() (prefill + scanned absorbed decode) must equal manual
    step-by-step greedy decoding."""
    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.key(3))
    rng = np.random.default_rng(SEED + 11)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
    n_new = 4

    got = np.asarray(L.generate(cfg, params, prompts, n_new))

    cache = L.init_latent_cache(cfg, 2, max_len=5 + n_new)
    lg, cache = L.forward(cfg, params, prompts, cache=cache)
    tok = lg[:, -1].argmax(-1).astype(jnp.int32)
    pos = jnp.full((2,), 5, jnp.int32)
    want = []
    for _ in range(n_new):
        want.append(np.asarray(tok))
        lg, cache = L.decode_step(cfg, params, tok, pos, cache)
        tok = lg.argmax(-1).astype(jnp.int32)
        pos = pos + 1
    np.testing.assert_array_equal(got, np.stack(want, axis=1))


def test_mla_moe_yarn_matches_transformers():
    """Full DeepSeek-V2 geometry: MoE-MLA (routed + shared experts,
    first_k_dense mixed layers) with YaRN rope scaling — logits
    cross-validated against transformers DeepseekV2ForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "DeepseekV2ForCausalLM"):
        pytest.skip("transformers lacks DeepseekV2")

    torch.manual_seed(SEED + 8)
    conf = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=2,
        first_k_dense_replace=1, norm_topk_prob=False,
        routed_scaling_factor=1.5, topk_method="greedy",
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=64,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32.0, "beta_slow": 1.0,
                      "mscale": 0.707, "mscale_all_dim": 0.707},
    )
    model = transformers.DeepseekV2ForCausalLM(conf)
    model.eval()

    cfg, params = L.params_from_hf(model, dtype=jnp.float32)
    assert cfg.n_experts == 4 and cfg.n_shared_experts == 2
    assert cfg.yarn is not None and cfg.yarn.factor == 2.0
    rng = np.random.default_rng(SEED + 9)
    tokens = rng.integers(0, cfg.vocab_size, (2, 12))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = L.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # absorbed decode path consistency on the same model
    cache = L.init_kv_cache(cfg, 2, max_len=32)
    last, cache = L.prefill(cfg, params,
                            jnp.asarray(tokens[:, :-1], jnp.int32), cache)
    step, _ = L.decode_step(cfg, params,
                            jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 11, jnp.int32), cache)
    # decode logits at the last position ~ forward logits there (int8 latent)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_mla_moe_tiny_quantized_and_engine():
    """tiny_moe (MoE-MLA + yarn) with INT8 expert stacks serves through the
    continuous-batching engine identically to stepwise generation."""
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg = L.MLAConfig.tiny_moe(dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(SEED % 83)),
                               bits=8)
    rng = np.random.default_rng(SEED + 11)
    prompt = list(map(int, rng.integers(1, cfg.vocab_size, 7)))
    n_new = 4

    cache = L.init_kv_cache(cfg, 1, max_len=48)
    lg, cache = L.prefill(cfg, params, jnp.asarray([prompt], jnp.int32), cache)
    want, tok, pos = [], int(lg.argmax(-1)[0]), len(prompt)
    for _ in range(n_new):
        want.append(tok)
        lg, cache = L.decode_step(cfg, params, jnp.asarray([tok], jnp.int32),
                                  jnp.asarray([pos], jnp.int32), cache)
        tok = int(lg.argmax(-1)[0]); pos += 1

    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=48,
                                           prefill_chunk=4))
    eng.submit(Request(rid=0, prompt=prompt,
                       sampling=SamplingParams(max_new_tokens=n_new)))
    assert eng.run()[0].tokens == want


def test_mla_forward_verify_matches_stepwise():
    """forward_verify (multi-token absorbed verify for speculation) must
    reproduce sequential decode_step: same cache contents and the same
    greedy tokens at every verified position, with per-row start offsets."""
    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.init_params(cfg, jax.random.key(5))
    rng = np.random.default_rng(SEED + 21)
    prompts = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)
    T = 4

    # rows advance from different positions: row0 from 6, row1 from 4
    starts = np.asarray([6, 4], np.int32)
    cache0 = L.init_latent_cache(cfg, 2, max_len=16)
    _, cache0 = L.forward(cfg, params, prompts, cache=cache0)

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, T)), jnp.int32)
    positions = (jnp.asarray(starts)[:, None]
                 + jnp.arange(T, dtype=jnp.int32)[None])

    lg_v, cache_v = L.forward_verify(cfg, params, toks, positions, cache0)
    assert lg_v.shape == (2, T, cfg.vocab_size)

    # oracle: one decode_step per token (per-row positions)
    cache_s = cache0
    step_logits = []
    for j in range(T):
        lg, cache_s = L.decode_step(cfg, params, toks[:, j], positions[:, j],
                                    cache_s)
        step_logits.append(np.asarray(lg))
    want = np.stack(step_logits, axis=1)               # [B, T, V]

    got = np.asarray(lg_v)
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 2e-3
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    # cache contents written at the same slots
    np.testing.assert_array_equal(np.asarray(cache_v.c_codes),
                                  np.asarray(cache_s.c_codes))
    np.testing.assert_array_equal(np.asarray(cache_v.k_pe, np.float32),
                                  np.asarray(cache_s.k_pe, np.float32))
    # length tracks true per-row live positions (decode_step's uniform +1
    # over-counts rows that re-advance from an earlier position)
    np.testing.assert_array_equal(
        np.asarray(cache_v.length),
        np.broadcast_to(np.asarray(positions[:, -1] + 1),
                        cache_v.length.shape))


def test_mla_speculative_greedy_identical():
    """Speculative decoding through the engine must emit EXACTLY the same
    greedy tokens as normal decode for MLA models (the dense-KV invariant,
    models/speculative.py, now holds for the latent-cache verify path)."""
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(7)), bits=8)
    rng = np.random.default_rng(SEED + 31)
    prompts = [
        ([5, 9, 11, 5, 9, 11, 5, 9, 11, 5, 9] * 2)[:20],   # repetitive
        rng.integers(1, 60, 17).tolist(),                   # random
    ]

    def run(spec):
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=2, max_seq_len=128, decode_block=3, speculate=spec))
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p,
                               sampling=SamplingParams(max_new_tokens=16)))
        return [r.tokens for r in sorted(eng.run(), key=lambda r: r.rid)]

    base = run(0)
    spec = run(4)
    assert [len(t) for t in base] == [16, 16]
    assert spec == base


def test_mla_moe_group_limited_matches_transformers():
    """DeepSeek-V2/V2-Chat device-limited routing (topk_method
    "group_limited_greedy": per-group max -> topk_group groups eligible ->
    expert top-k) cross-validated against transformers DeepseekV2."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "DeepseekV2ForCausalLM"):
        pytest.skip("transformers lacks DeepseekV2")

    torch.manual_seed(SEED + 40)
    conf = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, num_experts_per_tok=3, n_shared_experts=1,
        first_k_dense_replace=1, norm_topk_prob=False,
        routed_scaling_factor=1.0,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=64,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.DeepseekV2ForCausalLM(conf)
    model.eval()

    cfg, params = L.params_from_hf(model, dtype=jnp.float32)
    assert cfg.topk_method == "group_limited_greedy"
    assert cfg.n_group == 4 and cfg.topk_group == 2
    rng = np.random.default_rng(SEED + 41)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = L.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # group limiting changes routing vs plain greedy on the same weights
    plain, _ = L.forward(dataclasses_replace(cfg, topk_method="greedy"),
                         params, jnp.asarray(tokens, jnp.int32))
    assert np.abs(np.asarray(plain) - np.asarray(got)).max() > 1e-4


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_mla_deepseek_v3_noaux_matches_transformers():
    """DeepSeek-V3 sigmoid noaux_tc routing (selection-only correction
    bias, top-2-sum group scores, weights from unbiased sigmoid scores)
    cross-validated against transformers DeepseekV3ForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "DeepseekV3ForCausalLM"):
        pytest.skip("transformers lacks DeepseekV3")

    torch.manual_seed(SEED + 50)
    conf = transformers.DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, num_experts_per_tok=3, n_shared_experts=1,
        first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=2.5, n_group=4, topk_group=2,
        kv_lora_rank=32, q_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=64,
        rope_theta=10_000.0, rms_norm_eps=1e-5, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = transformers.DeepseekV3ForCausalLM(conf)
    model.eval()
    # non-zero correction bias so selection != weighting
    with torch.no_grad():
        for li in range(1, 3):
            model.model.layers[li].mlp.gate.e_score_correction_bias.uniform_(
                -0.2, 0.2)

    cfg, params = L.params_from_hf(model, dtype=jnp.float32)
    assert cfg.topk_method == "noaux_tc"
    assert "router_bias" in params["layers"][1]
    assert float(jnp.abs(params["layers"][1]["router_bias"]).max()) > 0

    rng = np.random.default_rng(SEED + 51)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))
    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = L.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=3e-3)

    # absorbed decode consistency (V3 geometry through the latent cache)
    cache = L.init_kv_cache(cfg, 2, max_len=32)
    _, cache = L.prefill(cfg, params,
                         jnp.asarray(tokens[:, :-1], jnp.int32), cache)
    step, _ = L.decode_step(cfg, params, jnp.asarray(tokens[:, -1], jnp.int32),
                            jnp.full((2,), 9, jnp.int32), cache)
    rel = np.abs(np.asarray(step) - want[:, -1]).max() / np.abs(want[:, -1]).max()
    assert rel < 0.08, rel


def test_mla_moe_expert_parallel_matches_single():
    """MLA-MoE under expert parallelism (cfg.ep_axis inside shard_map:
    whole quantized routed experts per shard + psum; shared experts
    replicated) == single device, for greedy and noaux_tc routers."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from piquant_tpu.quant.linear import QuantizedExpertStack

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("ep",))

    for method, extra in (("greedy", {}),
                          ("noaux_tc", dict(n_group=2, topk_group=1))):
        cfg = dataclasses.replace(L.MLAConfig.tiny_moe(), dtype=jnp.float32,
                                  topk_method=method, **extra)
        cfg_ep = dataclasses.replace(cfg, ep_axis="ep")
        params = L.quantize_params(L.init_params(cfg, jax.random.key(8)),
                                   bits=8)
        layer = params["layers"][1]          # MoE layer (first_k_dense=1)
        assert "router" in layer
        x = jax.random.normal(jax.random.key(9), (2, 5, cfg.d_model),
                              jnp.float32)
        want = np.asarray(L._mlp(cfg, layer, x))

        moe_keys = ("moe_w1", "moe_w2", "moe_w3")
        stacked = {k: layer[k] for k in moe_keys}
        rest = {k: v for k, v in layer.items() if k not in moe_keys}

        def stack_spec(st):
            return QuantizedExpertStack(
                data=P("ep", None, None), scale=P("ep", None, None),
                zero_point=P("ep", None, None), bits=st.bits, k=st.k,
                group_size=st.group_size)

        @jax.jit
        def run(stacked_, rest_, x_):
            return shard_map(
                lambda st, rt, xv: L._mlp(cfg_ep, {**rt, **st}, xv),
                mesh=mesh,
                in_specs=({k: stack_spec(stacked_[k]) for k in moe_keys},
                          jax.tree.map(lambda _: P(), rest_), P()),
                out_specs=P(),
            )(stacked_, rest_, x_)

        got = np.asarray(run(stacked, rest, x))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mla_int4_latent_cache():
    """kv_bits=4 on the latent cache: int4 codes, bounded decode error,
    engine-servable."""
    import dataclasses
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    cfg4 = dataclasses.replace(cfg, kv_bits=4)
    params = L.init_params(cfg, jax.random.key(9))
    rng = np.random.default_rng(SEED + 61)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    full, _ = L.forward(cfg, params, toks)

    cache = L.init_latent_cache(cfg4, 2, max_len=16)
    # kv4 latent codes are nibble-packed uint8, [L,B,S,R/2]
    assert cache.c_codes.dtype == jnp.uint8
    assert cache.c_codes.shape[-1] == cfg4.kv_lora_rank // 2
    _, cache = L.forward(cfg4, params, toks[:, :-1], cache=cache)
    lg, _ = L.decode_step(cfg4, params, toks[:, -1],
                          jnp.full((2,), 8, jnp.int32), cache)
    want = np.asarray(full[:, -1])
    rel = np.abs(np.asarray(lg) - want).max() / np.abs(want).max()
    assert rel < 0.15, rel

    eng = Engine(cfg4, L.quantize_params(params, bits=8),
                 EngineConfig(batch_slots=1, max_seq_len=48))
    eng.submit(Request(rid=0, prompt=[1, 2, 3],
                       sampling=SamplingParams(max_new_tokens=4)))
    assert len(eng.run()[0].tokens) == 4
