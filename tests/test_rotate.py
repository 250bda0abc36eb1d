"""QuaRot-style rotation tests (quant/rotate.py): the fold and the rotation
are exact reparameterizations — logits must match the unrotated model to
float-rounding noise — across dense, biased, MoE, and Gemma-norm topologies;
plus the orthogonality of the Kronecker-Hadamard construction and the
incoherence payoff (outlier channels flattened) the pass exists for."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant.rotate import fold_norms, rotate_params, rotation_matrix

SEED = 0x9032002


def _tiny(**kw):
    kw.setdefault("dtype", jnp.float32)
    return M.LlamaConfig.tiny(**kw)


def _logits(cfg, params, key=7):
    toks = jax.random.randint(jax.random.key(key), (2, 16), 0, cfg.vocab_size)
    out, _ = M.forward(cfg, params, toks, attend_in_layer=True)
    return np.asarray(out)


def _spiked(cfg, key):
    """Params with planted outlier channels — the case rotation fixes."""
    params = M.init_params(cfg, key)
    for layer in params["layers"]:
        for k in ("w1", "w3", "moe_w1", "moe_w3"):
            if k in layer:
                w = np.array(layer[k], np.float32)
                w[..., 3, :] *= 40.0   # hot residual channel
                layer[k] = jnp.asarray(w)
    return params


# ---------------------------------------------------------------------------
# rotation matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("d", [8, 24, 96, 256, 40])  # 2^k, 2^k*3, 2^k*5
def test_rotation_matrix_orthogonal(d):
    r = rotation_matrix(d, seed=3)
    np.testing.assert_allclose(r @ r.T, np.eye(d), atol=1e-12)
    assert abs(abs(np.linalg.det(r)) - 1.0) < 1e-9


def test_rotation_matrix_seeded():
    a, b = rotation_matrix(64, seed=1), rotation_matrix(64, seed=2)
    np.testing.assert_allclose(rotation_matrix(64, seed=1), a)
    assert np.abs(a - b).max() > 1e-3


# ---------------------------------------------------------------------------
# exact-equivalence across topologies
# ---------------------------------------------------------------------------

TOPOLOGIES = {
    "dense": {},
    "qkv_bias": dict(qkv_bias=True, o_bias=True),
    "gemma_norms": dict(norm_plus_one=True, scale_embed=True,
                        mlp_act="gelu"),
    "qk_norm": dict(qk_norm=True),
    "moe": dict(n_experts=4, moe_top_k=2),
    "moe_shared": dict(n_experts=4, moe_top_k=2, shared_expert_d_ff=64,
                       shared_expert_gated=True, router_bias=True),
}


@pytest.mark.parametrize("topo", sorted(TOPOLOGIES))
def test_fold_norms_exact(topo):
    cfg = _tiny(**TOPOLOGIES[topo])
    params = M.init_params(cfg, jax.random.key(SEED))
    # non-trivial norm gains (init is all-ones → fold would be a no-op)
    rng = np.random.default_rng(SEED)
    def perturb(p):
        for layer in p["layers"]:
            for k in ("attn_norm", "mlp_norm"):
                layer[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, layer[k].shape), jnp.float32)
        p["final_norm"] = jnp.asarray(
            rng.uniform(0.5, 1.5, p["final_norm"].shape), jnp.float32)
        return p
    params = perturb(params)
    base = _logits(cfg, params)
    folded = fold_norms(cfg, params)
    np.testing.assert_allclose(_logits(cfg, folded), base,
                               atol=5e-4, rtol=1e-3)
    for layer in folded["layers"]:
        expect = 0.0 if cfg.norm_plus_one else 1.0
        np.testing.assert_array_equal(np.asarray(layer["attn_norm"]), expect)


@pytest.mark.parametrize("topo", sorted(TOPOLOGIES))
def test_rotate_params_exact(topo):
    cfg = _tiny(**TOPOLOGIES[topo])
    params = M.init_params(cfg, jax.random.key(SEED + 1))
    base = _logits(cfg, params)
    rot = rotate_params(cfg, params, seed=11)
    # atol covers bf16 re-association noise: the rotation changes the
    # summation order inside the bf16 attention/matmul einsums
    np.testing.assert_allclose(_logits(cfg, rot), base, atol=3e-3, rtol=1e-3)


def test_rotate_then_cache_decode_exact():
    """The rotated model must also agree on the cached-decode path (the KV
    cache quantizes k/v — head space, untouched by R — so greedy decode
    tokens must match)."""
    cfg = _tiny()
    params = M.init_params(cfg, jax.random.key(SEED + 2))
    rot = rotate_params(cfg, params, seed=5)
    toks = jax.random.randint(jax.random.key(3), (1, 12), 0, cfg.vocab_size)

    def greedy(p, n=8):
        cache = M.init_kv_cache(cfg, 1, max_len=64)
        logits, cache = M.prefill(cfg, p, toks, cache)
        seq = []
        cur = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        pos = jnp.asarray([[toks.shape[1]]], jnp.int32)
        for _ in range(n):
            seq.append(int(cur[0, 0]))
            logits, cache = M.forward(cfg, p, cur, pos, cache)
            cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            pos = pos + 1
        return seq

    assert greedy(params) == greedy(rot)


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------

def test_sandwich_norms_rejected():
    cfg = _tiny(sandwich_norms=True)
    params = M.init_params(cfg, jax.random.key(SEED))
    with pytest.raises(ValueError, match="sandwich"):
        rotate_params(cfg, params)


def test_fused_params_rejected():
    cfg = _tiny()
    params = M.init_params(cfg, jax.random.key(SEED))
    fused = M.fuse_layer_projections(params, cfg)
    with pytest.raises(ValueError, match="fuse"):
        rotate_params(cfg, fused)


def test_quantized_params_rejected():
    cfg = _tiny()
    params = M.init_params(cfg, jax.random.key(SEED))
    qp = M.quantize_params(params, bits=4)
    with pytest.raises(ValueError, match="FLOAT"):
        rotate_params(cfg, qp)


# ---------------------------------------------------------------------------
# the payoff: incoherence + quantization error
# ---------------------------------------------------------------------------

def test_rotation_flattens_outliers_and_helps_int2():
    cfg = _tiny()
    params = _spiked(cfg, jax.random.key(SEED + 3))
    rot = rotate_params(cfg, params, seed=9)

    # (a) incoherence: the planted hot input channel is mixed away
    def chan_ratio(p):
        w = np.asarray(p["layers"][0]["w1"], np.float64)
        norms = np.linalg.norm(w, axis=1)
        return norms.max() / np.median(norms)
    assert chan_ratio(rot) < 0.25 * chan_ratio(params)

    # (b) quantization noise: channelwise-INT2 weight reconstruction MSE
    # shrinks (deterministic seeds; ~20% on this synthetic spike).  A toy
    # spike understates the payoff — real LLM weight/activation statistics
    # (moderate heavy tails, not one 40x row) are where rotation pays, and
    # that is measured on the trained proxy in benchmarks/ppl_quality.py.
    from piquant_tpu.quant.linear import quantize_linear_weight

    def w_mse(p):
        w = p["layers"][0]["w1"]
        ql = quantize_linear_weight(w, bits=2, channelwise=True)
        dq = ql.dequantize(jnp.float32)
        return float(jnp.mean((dq.astype(jnp.float32)
                               - w.astype(jnp.float32)) ** 2))

    assert w_mse(rot) < 0.9 * w_mse(params)


# ---------------------------------------------------------------------------
# loader integration: method="rotate..." recipes
# ---------------------------------------------------------------------------

def _hf_tiny():
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    torch.manual_seed(SEED)
    conf = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager")
    m = transformers.LlamaForCausalLM(conf)
    m.eval()
    return m


def test_loader_rotate_method():
    from piquant_tpu.models.loader import load_from_hf

    hf = _hf_tiny()
    cfgf, pf = load_from_hf(hf, dtype=jnp.float32)
    base = _logits(cfgf, pf)
    rng = np.random.default_rng(SEED)
    calib = jnp.asarray(rng.integers(0, 128, (2, 32)), jnp.int32)
    for method, kw in [("rotate", {}),
                       ("rotate+gptq", dict(calib_tokens=calib))]:
        cfg, qp = load_from_hf(hf, dtype=jnp.float32, quantize_bits=8,
                               group_size=32, method=method, **kw)
        got = _logits(cfg, qp)
        np.testing.assert_allclose(got, base, atol=0.35, rtol=0.1)


def test_loader_rejects_bad_method():
    from piquant_tpu.models.loader import load_from_hf

    hf = _hf_tiny()
    for bad in ("rotate+rotate", "gptq+rtn", "spin"):
        with pytest.raises(ValueError, match="unknown quantization method"):
            load_from_hf(hf, dtype=jnp.float32, quantize_bits=8, method=bad)
