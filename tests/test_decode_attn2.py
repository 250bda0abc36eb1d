"""Flash-decode v2 kernel (ops/pallas/decode_attn2.py), interpret mode:
state (acc, m, l) matches a numpy flash computation over the LIVE prefix,
for kv8 and packed kv4, with per-row positions (live-length masking)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.ops.pallas.decode_attn2 import decode_attention_state
from piquant_tpu.quant.kv_cache import pack4_pairs, split_scale_pairs

import os

# compiled on-chip (PIQUANT_TPU_TEST_TPU=1), interpret elsewhere
_INTERP = os.environ.get("PIQUANT_TPU_TEST_TPU") != "1"

SEED = 0xDA2


def _mk(b, hkv, rep, s, d, kv_bits, seed=SEED):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (b, hkv, rep, d)).astype(np.float32)
    qmax = 127 if kv_bits == 8 else 7
    kc = rng.integers(-qmax, qmax + 1, (b, hkv, s, d)).astype(np.int8)
    vc = rng.integers(-qmax, qmax + 1, (b, hkv, s, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (b, hkv, s, 1)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (b, hkv, s, 1)).astype(np.float32)
    return q, kc, vc, ks, vs


def _reference(q, kc, ks, vc, vs, pos, sm, start=None):
    """Dense softmax over positions start <= p < pos[b]; bf16 dots like
    the kernel."""
    b, hkv, rep, d = q.shape
    s = kc.shape[2]
    qb = jnp.asarray(q).astype(jnp.bfloat16)
    kb = jnp.asarray(kc).astype(jnp.bfloat16)
    scores = jnp.einsum("bhrd,bhsd->bhrs", qb, kb,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(ks)[:, :, None, :, 0] * sm
    valid = (np.arange(s)[None] < np.asarray(pos)[:, None])  # [B, S]
    if start is not None:
        valid &= (np.arange(s)[None] >= np.asarray(start)[:, None])
    scores = jnp.where(jnp.asarray(valid)[:, None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * jnp.asarray(vs)[:, :, None, :, 0]).astype(jnp.bfloat16)
    acc = jnp.einsum("bhrs,bhsd->bhrd", pv,
                     jnp.asarray(vc).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return np.asarray(acc), np.asarray(m), np.asarray(l)


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_state_matches_reference(kv_bits):
    b, hkv, rep, s, d = 2, 4, 2, 1024, 128
    q, kc, vc, ks, vs = _mk(b, hkv, rep, s, d, kv_bits)
    pos = np.array([701, 1024], np.int32)   # uneven live lengths, odd parity

    if kv_bits == 4:
        # pair-packed storage: [B,H,S/2,D] codes + [B,H,2,S/2] scales
        kcs = pack4_pairs(jnp.asarray(kc))
        vcs = pack4_pairs(jnp.asarray(vc))
        kss = split_scale_pairs(jnp.asarray(ks))
        vss = split_scale_pairs(jnp.asarray(vs))
    else:
        kcs, vcs = jnp.asarray(kc), jnp.asarray(vc)
        kss, vss = jnp.asarray(ks), jnp.asarray(vs)

    out = decode_attention_state(
        jnp.asarray(q), kcs, kss, vcs, vss,
        jnp.asarray(pos), 0.0883883, interpret=_INTERP)
    assert out is not None
    acc, m, l = (np.asarray(o) for o in out)

    racc, rm, rl = _reference(q, kc, ks, vc, vs, pos, 0.0883883)
    np.testing.assert_allclose(m, rm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l, rl, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(acc, racc, rtol=0.03, atol=0.02)

    # normalized context too (what the model consumes)
    np.testing.assert_allclose(acc / l, racc / rl, rtol=0.02, atol=0.01)


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_windowed_state_matches_reference(kv_bits):
    """Sliding-window starts: only start <= idx < pos contributes — incl.
    a window that crosses a chunk boundary and one landing mid-chunk."""
    b, hkv, rep, s, d = 3, 2, 2, 1024, 128
    q, kc, vc, ks, vs = _mk(b, hkv, rep, s, d, kv_bits, seed=SEED + 7)
    pos = np.array([700, 1024, 601], np.int32)
    start = np.array([651, 300, 0], np.int32)  # odd mid-chunk, cross, full

    if kv_bits == 4:
        kcs, vcs = pack4_pairs(jnp.asarray(kc)), pack4_pairs(jnp.asarray(vc))
        kss = split_scale_pairs(jnp.asarray(ks))
        vss = split_scale_pairs(jnp.asarray(vs))
    else:
        kcs, vcs = jnp.asarray(kc), jnp.asarray(vc)
        kss, vss = jnp.asarray(ks), jnp.asarray(vs)

    out = decode_attention_state(
        jnp.asarray(q), kcs, kss, vcs, vss,
        jnp.asarray(pos), 0.0883883, starts=jnp.asarray(start),
        interpret=_INTERP)
    assert out is not None
    acc, m, l = (np.asarray(o) for o in out)

    racc, rm, rl = _reference(q, kc, ks, vc, vs, pos, 0.0883883, start)
    np.testing.assert_allclose(m, rm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l, rl, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(acc / l, racc / rl, rtol=0.02, atol=0.01)


def test_dead_chunks_do_not_contribute():
    """pos=1 (single live position): output equals V[0] exactly (softmax of
    one element), regardless of garbage elsewhere in the cache."""
    b, hkv, rep, s, d = 1, 2, 2, 1024, 128
    q, kc, vc, ks, vs = _mk(b, hkv, rep, s, d, 8, seed=SEED + 1)
    pos = np.array([1], np.int32)
    out = decode_attention_state(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(ks),
        jnp.asarray(vc), jnp.asarray(vs), jnp.asarray(pos), 1.0,
        interpret=_INTERP)
    acc, m, l = (np.asarray(o) for o in out)
    np.testing.assert_allclose(l, np.ones_like(l), rtol=1e-6)
    want = (vc[:, :, 0].astype(np.float32) * vs[:, :, 0])[:, :, None]
    np.testing.assert_allclose(acc, np.broadcast_to(want, acc.shape),
                               rtol=1e-2, atol=1e-3)


def test_geometry_fallback():
    q = jnp.zeros((1, 2, 2, 96), jnp.float32)     # d not 128-multiple
    kc = jnp.zeros((1, 2, 512, 96), jnp.int8)
    ks = jnp.zeros((1, 2, 512, 1), jnp.float32)
    assert decode_attention_state(q, kc, ks, kc, ks,
                                  jnp.zeros(1, jnp.int32), 1.0,
                                  interpret=_INTERP) is None


def _decode_ab(cfg, seed, prefill_len=8, expect_engaged=True):
    """Run one decode step twice — XLA split-softmax (PIQUANT_ATTN2=0) vs
    the attn2 kernel (force, interpret) — and return (base, fast) logits.
    Asserts the kernel actually ENGAGED on the fast run (head_dim must be
    a 128-multiple; a None return silently falls back to the XLA path and
    would make the comparison vacuous)."""
    import os

    import piquant_tpu.ops.pallas.decode_attn2 as DA2
    from piquant_tpu.models import llama as M

    params = M.quantize_params(M.init_params(cfg, jax.random.key(seed)),
                               bits=8)
    rng = np.random.default_rng(SEED + seed)
    toks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, prefill_len + 1)), jnp.int32)

    engaged = []
    orig = DA2.decode_attention_state

    def spy(*a, **k):
        r = orig(*a, **k)
        engaged.append(r is not None)
        return r

    def run():
        cache = M.init_kv_cache(cfg, 2, max_len=1024)
        _, cache = M.forward(cfg, params, toks[:, :-1], cache=cache,
                             attend_in_layer=True,
                             kv_write_start=jnp.int32(0))
        lg, _ = M.decode_step(cfg, params, toks[:, -1],
                              jnp.full((2,), prefill_len, jnp.int32), cache)
        return np.asarray(lg)

    os.environ["PIQUANT_ATTN2"] = "0"
    try:
        base = run()
    finally:
        os.environ["PIQUANT_ATTN2"] = "force"
    DA2.decode_attention_state = spy
    try:
        fast = run()
    finally:
        DA2.decode_attention_state = orig
        os.environ.pop("PIQUANT_ATTN2")

    if expect_engaged:
        assert engaged and all(engaged), engaged
    return base, fast


def test_model_decode_integration():
    """decode_step through the attn2 kernel (forced, interpret) matches the
    XLA split-softmax path on a quantized tiny model."""
    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=128, d_model=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=256, max_seq_len=2048,
                        head_dim_override=128, dtype=jnp.float32)
    base, fast = _decode_ab(cfg, 11)
    # ~0.7% measured: both paths round probabilities to bf16 before the
    # V dot, at different values (normalized vs unnormalized), so the
    # rounding noise is uncorrelated — same 2e-2 band as the kernel test
    rel = np.abs(fast - base).max() / np.abs(base).max()
    assert rel < 2e-2, rel
    assert (fast.argmax(-1) == base.argmax(-1)).all()


def test_model_decode_integration_kv4():
    """kv4 decode engages the attn2 kernel through the pair-packed stacked
    cache; the A/B vs the XLA unpack path stays within the softmax
    rounding band."""
    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=128, d_model=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=256, max_seq_len=2048,
                        head_dim_override=128, dtype=jnp.float32, kv_bits=4)
    base, fast = _decode_ab(cfg, 12)
    rel = np.abs(fast - base).max() / np.abs(base).max()
    assert rel < 2e-2, rel
    assert (fast.argmax(-1) == base.argmax(-1)).all()


@pytest.mark.parametrize("kind", ["sliding", "sliding_alt_sinks", "chunked",
                                  "chunked_nope"])
def test_model_decode_integration_windowed(kind):
    """Windowed families decode through the attn2 kernel with a per-layer
    window START (the ADVICE r3 high finding: the old gate attended the
    full prefix on sliding/chunked layers).  Prefill 24 tokens with an
    8-position window so the mask actually bites, then A/B one decode
    step vs the XLA masked path."""
    from piquant_tpu.models import llama as M

    common = dict(vocab_size=128, d_model=256, n_layers=4, n_heads=4,
                  n_kv_heads=2, d_ff=256, max_seq_len=2048,
                  head_dim_override=128, dtype=jnp.float32)
    if kind == "sliding":          # Mistral: every layer sliding
        cfg = M.LlamaConfig(sliding_window=8, **common)
    elif kind == "sliding_alt_sinks":  # GPT-OSS: alternating + sink logits
        cfg = M.LlamaConfig(sliding_window=8, sliding_pattern=2,
                            attn_sinks=True, **common)
    elif kind == "chunked":        # every layer chunk-local
        cfg = M.LlamaConfig(chunk_window=8, **common)
    else:                          # Llama-4: chunked except nope layers
        cfg = M.LlamaConfig(chunk_window=8, nope_pattern=2, **common)

    # prefill 24 makes the chunked window EMPTY (24 // 8 * 8 == 24):
    # self-only attention, the nastiest case.  There the XLA path rounds
    # es/denom*vsq through bf16 while the kernel fold keeps f32, a
    # systematic ~0.4%/layer difference — hence the 3e-2 band.
    base, fast = _decode_ab(cfg, 13, prefill_len=24)
    rel = np.abs(fast - base).max() / np.abs(base).max()
    assert rel < 3e-2, rel
    assert (fast.argmax(-1) == base.argmax(-1)).all()


def test_model_decode_integration_windowed_kv4():
    """Sliding window + pair-packed kv4 together: the window-start masking
    must compose with the even/odd parity column layout."""
    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=128, d_model=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=256, max_seq_len=2048,
                        head_dim_override=128, dtype=jnp.float32, kv_bits=4,
                        sliding_window=9)  # odd window: starts hit both parities
    base, fast = _decode_ab(cfg, 14, prefill_len=24)
    rel = np.abs(fast - base).max() / np.abs(base).max()
    assert rel < 3e-2, rel
    assert (fast.argmax(-1) == base.argmax(-1)).all()
