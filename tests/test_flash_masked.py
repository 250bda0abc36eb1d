"""Native GQA flash prefill kernel (ops/pallas/flash.py), interpret mode:
context matches the materialized-scores reference for every mask family —
vanilla causal, sliding window, chunked (incl. nonzero pos0), softcap,
sinks, and the GPT-OSS window+sinks combination."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.ops.pallas.flash import flash_prefill_masked

_INTERP = os.environ.get("PIQUANT_TPU_TEST_TPU") != "1"


def _kmode():
    """Compiled on-chip (PIQUANT_TPU_TEST_TPU=1), interpret elsewhere —
    forcing interpret mode against the remote TPU backend deadlocks
    (see test_qmatmul.py)."""
    import contextlib
    import os
    if os.environ.get("PIQUANT_TPU_TEST_TPU") == "1":
        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


SEED = 0xF1A5


def _mk(b, hkv, rep, t, d, seed=SEED):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (b, hkv, rep, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32)
    return q, k, v


def _reference(q, k, v, sm, pos0=None, window=None, chunk=None,
               softcap=None, sinks=None):
    """The llama._attention in-layer path: bf16 dots, f32 softmax,
    kp <= qp inclusive causal + optional window/chunk, softcap pre-mask,
    sinks in the denominator."""
    b, hkv, rep, t, d = q.shape
    s = jnp.einsum("bhrtd,bhsd->bhrts", jnp.asarray(q).astype(jnp.bfloat16),
                   jnp.asarray(k).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * sm
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    qp = np.arange(t)[:, None]
    kp = np.arange(t)[None, :]
    ok = kp <= qp
    if window is not None:
        ok = ok & (kp > qp - window)
    masks = np.broadcast_to(ok, (b, t, t)).copy()
    if chunk is not None:
        p0 = np.zeros(b, np.int64) if pos0 is None else np.asarray(pos0)
        for bi in range(b):
            okc = ((p0[bi] + kp) // chunk == (p0[bi] + qp) // chunk)
            masks[bi] = ok & okc
    s = jnp.where(jnp.asarray(masks)[:, None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    if sinks is not None:
        snk = jnp.asarray(sinks)[None, :, :, None, None]
        m = jnp.maximum(m, snk)
    p = jnp.exp(s - m)
    den = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        den = den + jnp.exp(snk - m)
    ctx = jnp.einsum("bhrts,bhsd->bhrtd", (p / den).astype(jnp.bfloat16),
                     jnp.asarray(v).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return np.asarray(ctx)


CASES = {
    "causal": {},
    "sliding": {"window": 48},
    "sliding_tiny": {"window": 3},
    "chunked": {"chunk": 64},
    "chunked_pos0": {"chunk": 96, "pos0": np.array([0, 40], np.int32)},
    "softcap": {"softcap": 30.0},
    "softcap_sliding": {"softcap": 20.0, "window": 100},
    "sinks": {"sinks": True},
    "gpt_oss": {"window": 64, "sinks": True},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_reference(name):
    b, hkv, rep, t, d = 2, 2, 4, 256, 128
    kw = dict(CASES[name])
    q, k, v = _mk(b, hkv, rep, t, d, seed=SEED + hash(name) % 97)
    if kw.pop("sinks", False):
        rng = np.random.default_rng(SEED + 1)
        sinks = rng.normal(0, 1, (hkv, rep)).astype(np.float32)
    else:
        sinks = None
    sm = 0.0883883

    got = flash_prefill_masked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), sm,
        sinks=None if sinks is None else jnp.asarray(sinks),
        **{kk: (jnp.asarray(vv) if kk == "pos0" else vv)
           for kk, vv in kw.items()},
        interpret=_INTERP)
    assert got is not None
    want = _reference(q, k, v, sm, sinks=sinks, **kw)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.02, atol=0.02)


def test_rep1_and_larger_t():
    """MHA (rep=1) at t=512 with a window crossing block boundaries."""
    b, hkv, rep, t, d = 1, 2, 1, 512, 128
    q, k, v = _mk(b, hkv, rep, t, d, seed=SEED + 11)
    got = flash_prefill_masked(jnp.asarray(q), jnp.asarray(k),
                               jnp.asarray(v), 0.0883883, window=130,
                               interpret=_INTERP)
    want = _reference(q, k, v, 0.0883883, window=130)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.02, atol=0.02)


def test_geometry_fallback():
    q = jnp.zeros((1, 2, 2, 200, 128), jnp.float32)   # t not 128-multiple
    k = jnp.zeros((1, 2, 200, 128), jnp.float32)
    assert flash_prefill_masked(q, k, k, 1.0, interpret=_INTERP) is None
    q = jnp.zeros((1, 2, 2, 256, 64), jnp.float32)    # d not 128-multiple
    k = jnp.zeros((1, 2, 256, 64), jnp.float32)
    assert flash_prefill_masked(q, k, k, 1.0, interpret=_INTERP) is None


# ---- full-model prefill A/B: flash (forced, interpret) vs materialized ----

def _forward_ab(cfg, seed, t=256):
    import os

    import piquant_tpu.ops.flash_prefill as FP
    from jax.experimental.pallas import tpu as pltpu
    from piquant_tpu.models import llama as M

    params = M.init_params(cfg, jax.random.key(seed))
    rng = np.random.default_rng(SEED + seed)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, t)), jnp.int32)

    engaged = []
    orig = FP.flash_prefill

    def spy(*a, **kw):
        r = orig(*a, **kw)
        engaged.append(r is not None)
        return r

    os.environ["PIQUANT_FLASH"] = "0"
    try:
        base, _ = M.forward(cfg, params, toks)
    finally:
        os.environ["PIQUANT_FLASH"] = "force"
    FP.flash_prefill = spy
    try:
        with jax.enable_x64(False), _kmode():
            # jit the interpret-mode forward: eager dispatch from the main
            # thread races the interpret machinery's own jnp dispatches on
            # io_callback worker threads (futex deadlock, NOTES.md r5 —
            # stacks: llama eager op vs shared_memory clock update);
            # inside ONE compiled call the main thread just waits
            fast, _ = jax.jit(lambda p, t: M.forward(cfg, p, t))(params,
                                                                 toks)
            fast = np.asarray(fast)
    finally:
        FP.flash_prefill = orig
        os.environ.pop("PIQUANT_FLASH")
    assert engaged and all(engaged), engaged
    return np.asarray(base), np.asarray(fast)


@pytest.mark.heavy_interpret
@pytest.mark.parametrize("kind", ["mistral", "gemma2", "gpt_oss", "llama4"])
def test_windowed_model_prefill(kind):
    """The windowed/softcap/sink families now PREFILL through the native
    flash kernel (VERDICT r3 #4) — logits must match the materialized
    path that llama.build_mask drives."""
    from piquant_tpu.models import llama as M

    common = dict(vocab_size=256, d_model=256, n_layers=4, n_heads=2,
                  n_kv_heads=1, d_ff=512, max_seq_len=512,
                  dtype=jnp.float32)
    if kind == "mistral":
        cfg = M.LlamaConfig(sliding_window=64, **common)
    elif kind == "gemma2":
        cfg = M.LlamaConfig(sliding_window=64, sliding_pattern=2,
                            attn_softcap=30.0, **common)
    elif kind == "gpt_oss":
        cfg = M.LlamaConfig(sliding_window=64, sliding_pattern=2,
                            attn_sinks=True, o_bias=True, **common)
    else:
        cfg = M.LlamaConfig(chunk_window=64, nope_pattern=2,
                            attn_temp_tuning=True, **common)

    base, fast = _forward_ab(cfg, 17)
    rel = np.abs(fast - base).max() / np.abs(base).max()
    assert rel < 2e-2, (kind, rel)
    agree = (fast.argmax(-1) == base.argmax(-1)).mean()
    assert agree > 0.99, (kind, agree)
