"""Mixtral-style MoE: routing correctness, quantized experts, expert
parallelism on the virtual CPU mesh, and transformers cross-validation."""

import os as _os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# on-chip: hardware bf16 dots vs interpret/CPU f32 — widen (NOTES r3/r5)
_ONCHIP = _os.environ.get("PIQUANT_TPU_TEST_TPU") == "1"
_MLP_TOL = dict(atol=2e-3, rtol=2e-3) if _ONCHIP else dict(atol=1e-4, rtol=1e-4)
_HF_TOL = dict(atol=5e-2, rtol=5e-2) if _ONCHIP else dict(atol=2e-3, rtol=2e-3)
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.models import llama as M

def _kmode():
    """Compiled on-chip (PIQUANT_TPU_TEST_TPU=1), interpret elsewhere —
    forcing interpret mode against the remote TPU backend deadlocks
    (see test_qmatmul.py)."""
    import contextlib
    import os
    if os.environ.get("PIQUANT_TPU_TEST_TPU") == "1":
        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


SEED = 0x9032002


def _tiny_moe(**kw):
    return M.LlamaConfig.tiny(n_experts=4, moe_top_k=2, dtype=jnp.float32,
                              **kw)


def _naive_moe(layer, x, top_k, act="silu"):
    """Per-token numpy reference: route, softmax over selected, weighted
    sum of chosen expert MLPs."""
    xf = np.asarray(x, np.float64)
    router = np.asarray(layer["router"], np.float64)
    w1 = np.asarray(layer["moe_w1"], np.float64)
    w3 = np.asarray(layer["moe_w3"], np.float64)
    w2 = np.asarray(layer["moe_w2"], np.float64)
    b, t, d = xf.shape
    out = np.zeros_like(xf)
    for bi in range(b):
        for ti in range(t):
            v = xf[bi, ti]
            logits = v @ router
            top = np.argsort(-logits)[:top_k]
            sel = logits[top]
            p = np.exp(sel - sel.max())
            p /= p.sum()
            acc = np.zeros(d)
            for w, e in zip(p, top):
                g = v @ w1[e]
                u = v @ w3[e]
                sg = g / (1 + np.exp(-g))  # silu
                acc += w * ((sg * u) @ w2[e])
            out[bi, ti] = acc
    return out


def test_moe_mlp_matches_naive():
    cfg = _tiny_moe()
    params = M.init_params(cfg, jax.random.key(0))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(1), (2, 5, cfg.d_model), jnp.float32)
    got = np.asarray(M._mlp(cfg, layer, x))
    want = _naive_moe(layer, x, cfg.moe_top_k)
    np.testing.assert_allclose(got, want, **_MLP_TOL)


def test_moe_forward_and_decode():
    cfg = _tiny_moe()
    params = M.init_params(cfg, jax.random.key(0))
    toks = jax.random.randint(jax.random.key(2), (2, 8), 0, cfg.vocab_size,
                              jnp.int32)
    logits, _ = M.forward(cfg, params, toks)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))

    cache = M.init_kv_cache(cfg, 2, max_len=16)
    last, cache = M.prefill(cfg, params, toks, cache)
    step, cache = M.decode_step(cfg, params,
                                last.argmax(-1).astype(jnp.int32),
                                jnp.full((2,), 8, jnp.int32), cache)
    assert step.shape == (2, cfg.vocab_size)


def test_moe_fuse_layer_projections():
    """fuse_layer_projections on a MoE model fuses only the attention
    projections (MoE layers have no w1/w3) and keeps outputs identical.
    Regression: used to raise KeyError on layer["w1"] (ADVICE r1)."""
    import numpy as np

    cfg = _tiny_moe()
    params = M.init_params(cfg, jax.random.key(0))
    toks = jax.random.randint(jax.random.key(1), (2, 8), 0, cfg.vocab_size,
                              jnp.int32)
    want, _ = M.forward(cfg, params, toks)
    fused = M.fuse_layer_projections(params, cfg)
    assert "wqkv" in fused["layers"][0] and "w13" not in fused["layers"][0]
    got, _ = M.forward(cfg, fused, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_moe_quantized_params():
    from piquant_tpu.quant.linear import QuantizedExpertStack

    cfg = _tiny_moe()
    params = M.init_params(cfg, jax.random.key(0))
    qp = M.quantize_params(params, bits=8)
    st = qp["layers"][0]["moe_w1"]
    assert isinstance(st, QuantizedExpertStack)
    assert st.n_experts == 4 and st.data.shape == (4, cfg.d_model, cfg.d_ff)

    x = jax.random.normal(jax.random.key(3), (2, 5, cfg.d_model), jnp.float32)
    y_f = np.asarray(M._mlp(cfg, params["layers"][0], x))
    y_q = np.asarray(M._mlp(cfg, qp["layers"][0], x))
    # int8 experts: small quantization error only
    rel = np.abs(y_q - y_f).max() / (np.abs(y_f).max() + 1e-9)
    assert rel < 0.05, rel


def test_moe_expert_parallel_matches_single():
    """shard_map over an ep axis (whole experts per shard + psum) must equal
    the single-device MoE MLP."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("ep",))

    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep")
    params = M.init_params(cfg, jax.random.key(0))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(4), (2, 5, cfg.d_model), jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))

    moe_keys = ("moe_w1", "moe_w2", "moe_w3")
    stacked = {k: layer[k] for k in moe_keys}
    rest = {k: v for k, v in layer.items() if k not in moe_keys}

    @jax.jit
    def run(stacked_, rest_, x_):
        def inner(st, rt, xv):
            return M._mlp(cfg_ep, {**rt, **st}, xv)
        return shard_map(
            inner, mesh=mesh,
            in_specs=({k: P("ep", None, None) for k in moe_keys},
                      jax.tree.map(lambda _: P(), rest_), P()),
            out_specs=P(),
        )(stacked_, rest_, x_)

    got = np.asarray(run(stacked, rest, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("quantized", [False, True])
def test_mixtral_loader_matches_transformers(quantized):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from piquant_tpu.models.loader import load_from_hf

    torch.manual_seed(SEED + 6)
    conf = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    model = transformers.MixtralForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.n_experts == 4 and cfg.moe_top_k == 2
    rng = np.random.default_rng(SEED + 7)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    if quantized:
        params = M.quantize_params(params, bits=8)
        got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
        # int8 error bound only
        denom = np.abs(want).max()
        assert np.abs(np.asarray(got) - want).max() / denom < 0.05
    else:
        got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, **_HF_TOL)


def test_qwen2_moe_loader_matches_transformers():
    """Qwen2-MoE: softmax-all routing (no renorm), shared expert with
    sigmoid gate, qkv biases — cross-validated against transformers."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from piquant_tpu.models.loader import load_from_hf

    torch.manual_seed(SEED + 12)
    conf = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, shared_expert_intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.Qwen2MoeForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.n_experts == 4 and not cfg.moe_renormalize
    assert "shared_w1" in params["layers"][0]
    rng = np.random.default_rng(SEED + 13)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, **_HF_TOL)


def test_moe_expert_parallel_quantized_matches_single():
    """EP with QuantizedExpertStack leaves: whole quantized experts per
    shard (data/scale/zp all sharded on the expert axis) == single device."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("ep",))

    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep")
    params = M.quantize_params(M.init_params(cfg, jax.random.key(5)), bits=8)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(6), (2, 5, cfg.d_model), jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))

    moe_keys = ("moe_w1", "moe_w2", "moe_w3")
    stacked = {k: layer[k] for k in moe_keys}
    rest = {k: v for k, v in layer.items() if k not in moe_keys}

    from piquant_tpu.quant.linear import QuantizedExpertStack

    def stack_spec(st):
        return QuantizedExpertStack(
            data=P("ep", None, None), scale=P("ep", None, None),
            zero_point=P("ep", None, None), bits=st.bits, k=st.k,
            group_size=st.group_size)

    @jax.jit
    def run(stacked_, rest_, x_):
        return shard_map(
            lambda st, rt, xv: M._mlp(cfg_ep, {**rt, **st}, xv),
            mesh=mesh,
            in_specs=({k: stack_spec(stacked_[k]) for k in moe_keys},
                      jax.tree.map(lambda _: P(), rest_), P()),
            out_specs=P(),
        )(stacked_, rest_, x_)

    got = np.asarray(run(stacked, rest, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bits,group_size", [
    (2, None), (4, None), (8, None),   # channelwise: analytic zp fold
    (2, 32), (4, 32),                  # grouped: in-register dequant kernel
])
def test_moe_ragged_matches_dense(bits, group_size):
    """The grouped (megablocks-style) ragged path must match the
    dense-all-experts path on identical inputs (same routing, same
    quantized weights) — interpret mode exercises the Pallas kernel on CPU."""
    import os

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    # tiny() geometry (d_model 256, d_ff 512) is divisible by the kernel's
    # 128-lane N tiles
    cfg = M.LlamaConfig.tiny(n_experts=4, moe_top_k=2)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(3)),
                               bits=bits, group_size=group_size)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(4), (2, 32, cfg.d_model),
                          cfg.dtype) * 0.5

    want = np.asarray(M._mlp_moe(cfg, layer, x))  # dense (CPU backend)

    os.environ["PIQUANT_MOE_RAGGED"] = "force"
    try:
        with _kmode():
            got = M._moe_ragged_try(cfg, layer, x,
                                    *_routing_of(cfg, layer, x))
    finally:
        os.environ["PIQUANT_MOE_RAGGED"] = "1"
    assert got is not None, "ragged path refused a supported geometry"
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def _routing_of(cfg, layer, x):
    logits = jnp.einsum("btd,de->bte", x.astype(jnp.float32),
                        layer["router"].astype(jnp.float32))
    full = jax.nn.softmax(logits, axis=-1)
    probs, topi = jax.lax.top_k(full, cfg.moe_top_k)
    if cfg.moe_renormalize:
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return probs, topi


def test_ragged_routing_properties():
    """build_ragged_routing invariants: every assignment lands in its
    expert's padded region, blocks are single-expert, gates/token map round-trip."""
    import numpy as np

    from piquant_tpu.quant.moe import build_ragged_routing

    rng = np.random.default_rng(7)
    e, k, ntok, bm = 5, 2, 37, 8
    topi = jnp.asarray(rng.integers(0, e, (1, ntok, k)), jnp.int32)
    probs = jnp.asarray(rng.uniform(0, 1, (1, ntok, k)), jnp.float32)
    r = build_ragged_routing(topi, probs, e, bm)

    dest = np.asarray(r.dest); be = np.asarray(r.block_expert)
    tok = np.asarray(r.token_idx); gate = np.asarray(r.gate)
    flat_e = np.asarray(topi).reshape(-1)
    assert r.m_pad % bm == 0 and len(be) == r.m_pad // bm
    assert len(set(dest.tolist())) == dest.size  # no collisions
    # each assignment's block maps to its expert
    order_e = flat_e[np.asarray(np.argsort(flat_e, kind="stable"))]
    for d_, e_ in zip(dest, order_e):
        assert be[d_ // bm] == e_, (d_, e_, be[d_ // bm])
    # gates round-trip: sum of gates per token == sum of probs per token
    g_sum = np.zeros(ntok); np.add.at(g_sum, tok, gate)
    np.testing.assert_allclose(g_sum, np.asarray(probs).reshape(ntok, k).sum(-1),
                               rtol=1e-6)


def test_qwen3_moe_loader_matches_transformers():
    """Qwen3-MoE: qk-norm attention + Qwen2-MoE-style experts with NO
    shared expert; softmax-all routing (norm_topk_prob=False) —
    cross-validated against transformers Qwen3MoeForCausalLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Qwen3MoeForCausalLM"):
        pytest.skip("transformers lacks Qwen3Moe")
    from piquant_tpu.models.loader import load_from_hf

    torch.manual_seed(SEED + 22)
    conf = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=64, rope_theta=10_000.0, rms_norm_eps=1e-5,
        pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = transformers.Qwen3MoeForCausalLM(conf)
    model.eval()

    cfg, params = load_from_hf(model, dtype=jnp.float32)
    assert cfg.n_experts == 4 and cfg.qk_norm and not cfg.qkv_bias
    assert not cfg.moe_renormalize
    assert "shared_w1" not in params["layers"][0]
    assert "q_norm" in params["layers"][0]
    rng = np.random.default_rng(SEED + 23)
    tokens = rng.integers(0, cfg.vocab_size, (2, 10))

    with torch.no_grad():
        want = model(torch.tensor(tokens)).logits.numpy()

    got, _ = M.forward(cfg, params, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, **_HF_TOL)

    # greedy decode consistency through the quantized serving path
    qp = M.quantize_params(params, bits=8)
    cache = M.init_kv_cache(cfg, 2, max_len=16)
    lg, cache = M.prefill(cfg, qp, jnp.asarray(tokens, jnp.int32), cache)
    assert lg.shape == (2, cfg.vocab_size)


def test_moe_expert_parallel_with_bias_stacks():
    """GPT-OSS-style MoE (expert biases + clamped swiglu + router bias)
    under EP: bias stacks shard with their experts (param_shardings
    P(ep,None)) and the scan consumes e_local of each == single device."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("ep",))

    cfg = _tiny_moe(router_bias=True, moe_bias=True, moe_clamp_swiglu=True)
    cfg_ep = dataclasses.replace(cfg, ep_axis="ep")
    params = M.init_params(cfg, jax.random.key(13))
    layer = params["layers"][0]
    # non-zero biases so the EP slicing is actually exercised
    layer["router_b"] = jax.random.normal(jax.random.key(14),
                                          (cfg.n_experts,)) * 0.1
    layer["moe_b1"] = jax.random.normal(
        jax.random.key(15), layer["moe_b1"].shape) * 0.1
    layer["moe_b2"] = jax.random.normal(
        jax.random.key(16), layer["moe_b2"].shape) * 0.1
    x = jax.random.normal(jax.random.key(17), (2, 5, cfg.d_model), jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))

    ep_keys = ("moe_w1", "moe_w2", "moe_w3", "moe_b1", "moe_b2", "moe_b3")
    stacked = {k: layer[k] for k in ep_keys}
    rest = {k: v for k, v in layer.items() if k not in ep_keys}
    specs = {k: (P("ep", None, None) if layer[k].ndim == 3 else P("ep", None))
             for k in ep_keys}

    @jax.jit
    def run(stacked_, rest_, x_):
        return shard_map(
            lambda st, rt, xv: M._mlp(cfg_ep, {**rt, **st}, xv),
            mesh=mesh,
            in_specs=(specs, jax.tree.map(lambda _: P(), rest_), P()),
            out_specs=P(),
        )(stacked_, rest_, x_)

    got = np.asarray(run(stacked, rest, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("bits", [2, 4])
def test_moe_ragged_a8_matches_dense(bits):
    """The act-quant (W4A8/W2A8) ragged path must match the dense path
    under the SAME activation-quantization policy (act_quant_decode makes
    both quantize at every M)."""
    import os

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    cfg = M.LlamaConfig.tiny(n_experts=4, moe_top_k=2, act_quant_decode=True)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(5)),
                               bits=bits)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(6), (2, 32, cfg.d_model),
                          cfg.dtype) * 0.5

    want = np.asarray(M._mlp_moe(cfg, layer, x))  # dense W{bits}A8

    os.environ["PIQUANT_MOE_RAGGED"] = "force"
    try:
        with _kmode():
            got = M._moe_ragged_try(cfg, layer, x,
                                    *_routing_of(cfg, layer, x))
    finally:
        os.environ["PIQUANT_MOE_RAGGED"] = "1"
    assert got is not None, "a8 ragged path refused a supported geometry"
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=3e-2)
