"""Flash-attention prefill (ops/flash_prefill.py) vs the materialized-
scores XLA path: same logits on the standard causal subset, correct
fallbacks everywhere else.  The Mosaic kernel runs in interpret mode on
CPU via pltpu.force_tpu_interpret_mode."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.models import llama as M
from piquant_tpu.ops.flash_prefill import flash_prefill

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


def _cfg(**kw):
    # head_dim must be 128 (flash gate); T >= 256 and T % 128 == 0
    base = dict(vocab_size=256, d_model=256, n_layers=2, n_heads=2,
                n_kv_heads=1, d_ff=512, max_seq_len=512,
                dtype=jnp.float32)
    base.update(kw)
    return M.LlamaConfig(**base)


def test_kernel_matches_reference_math():
    rng = np.random.default_rng(SEED)
    b, hkv, rep, t, d = 1, 2, 2, 256, 128
    q = jnp.asarray(rng.normal(0, 1, (b, hkv, rep, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32))
    sm = d ** -0.5

    os.environ["PIQUANT_FLASH"] = "force"
    try:
        with jax.enable_x64(False), _kmode():
            got = flash_prefill(q, k, v, sm)
    finally:
        os.environ.pop("PIQUANT_FLASH")
    assert got is not None

    # reference: bf16 operands, f32 softmax, causal — the XLA path's recipe
    qb = q.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    scores = jnp.einsum("bhrtd,bhsd->bhrts", qb, kb,
                        preferred_element_type=jnp.float32) * sm
    causal = jnp.tril(jnp.ones((t, t), bool))
    scores = jnp.where(causal[None, None, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhrts,bhsd->bhrtd", probs.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    err = float(jnp.abs(got - want).max())
    assert err < 2e-2, err  # two bf16 roundings differ between the paths


@pytest.mark.heavy_interpret
def test_forward_logits_match():
    """Full-model prefill: flash vs materialized path, same argmax and
    close logits."""
    cfg = _cfg()
    params = M.init_params(cfg, jax.random.key(SEED % 101))
    rng = np.random.default_rng(SEED + 1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)), jnp.int32)

    os.environ["PIQUANT_FLASH"] = "0"
    try:
        y0, _ = M.forward(cfg, params, toks)
    finally:
        os.environ["PIQUANT_FLASH"] = "force"
    try:
        with jax.enable_x64(False), _kmode():
            # jitted: eager dispatch races the interpret machinery's own
            # jnp dispatches on io_callback threads (futex deadlock,
            # NOTES.md r5)
            y1, _ = jax.jit(lambda pp, tt: M.forward(cfg, pp, tt))(params,
                                                                   toks)
            y1 = np.asarray(y1)
    finally:
        os.environ.pop("PIQUANT_FLASH")

    a0, a1 = np.asarray(y0), np.asarray(y1)
    rel = np.abs(a0 - a1).max() / np.abs(a0).max()
    assert rel < 5e-3, rel
    assert (a0.argmax(-1) == a1.argmax(-1)).mean() > 0.99


@pytest.mark.parametrize("reason,kw,qshape", [
    ("head_dim!=128", {}, (1, 2, 2, 256, 64)),
    ("t too small", {}, (1, 2, 2, 128, 128)),
    ("t not 128-mult", {}, (1, 2, 2, 300, 128)),
])
def test_geometry_fallbacks(reason, kw, qshape):
    b, hkv, rep, t, d = qshape
    q = jnp.zeros(qshape, jnp.float32)
    k = jnp.zeros((b, hkv, t, d), jnp.float32)
    v = jnp.zeros((b, hkv, t, d), jnp.float32)
    os.environ["PIQUANT_FLASH"] = "force"
    try:
        assert flash_prefill(q, k, v, 1.0) is None, reason
    finally:
        os.environ.pop("PIQUANT_FLASH")


@pytest.mark.heavy_interpret
def test_config_fallbacks_still_correct():
    """Sliding-window configs (now routed through the native masked
    kernel) still produce window-dependent output: windowed != full."""
    cfg = _cfg(sliding_window=64)
    params = M.init_params(cfg, jax.random.key(7))
    rng = np.random.default_rng(SEED + 2)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 256)), jnp.int32)
    os.environ["PIQUANT_FLASH"] = "force"
    try:
        with jax.enable_x64(False), _kmode():
            yw, _ = jax.jit(lambda pp, tt: M.forward(cfg, pp, tt))(params,
                                                                   toks)
            yw = np.asarray(yw)
            yf, _ = jax.jit(lambda pp, tt: M.forward(_cfg(), pp, tt))(params,
                                                                      toks)
            yf = np.asarray(yf)
    finally:
        os.environ.pop("PIQUANT_FLASH")
    assert not np.allclose(np.asarray(yw), np.asarray(yf))


@pytest.mark.heavy_interpret
def test_t768_block_selection():
    """T=768 (a serving bucket size) must pick a dividing block (256), not
    crash on the 512 default — regression from the serving load bench."""
    rng = np.random.default_rng(SEED + 9)
    b, hkv, rep, t, d = 1, 2, 2, 768, 128
    q = jnp.asarray(rng.normal(0, 1, (b, hkv, rep, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, hkv, t, d)).astype(np.float32))
    os.environ["PIQUANT_FLASH"] = "force"
    try:
        with jax.enable_x64(False), _kmode():
            got = flash_prefill(q, k, v, d ** -0.5)
    finally:
        os.environ.pop("PIQUANT_FLASH")
    assert got is not None and got.shape == (b, hkv, rep, t, d)
