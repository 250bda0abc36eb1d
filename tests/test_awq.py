"""AWQ-style activation-aware scaling (quant/awq.py): fold exactness,
error-reduction property, calibration mechanics, guard rails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant import awq
from piquant_tpu.quant.linear import quantize_linear_weight

SEED = 0x9032002


@pytest.fixture(scope="module")
def tiny_float():
    cfg = M.LlamaConfig.tiny(dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(SEED % 97))
    rng = np.random.default_rng(SEED)
    calib = rng.integers(0, cfg.vocab_size, (2, 32))
    return cfg, params, calib


def test_collect_stats_covers_every_linear(tiny_float):
    cfg, params, calib = tiny_float
    stats = awq.collect_activation_stats(cfg, params, calib)
    for li in range(cfg.n_layers):
        for k in ("wq", "wk", "wv", "wo", "w1", "w3", "w2"):
            assert (li, k) in stats, (li, k)
            assert stats[(li, k)].shape == (params["layers"][li][k].shape[0],)
            assert np.all(stats[(li, k)] >= 0)


def test_fold_is_float_exact(tiny_float):
    """(x * norm/s) @ (s*W) == (x * norm) @ W up to float rounding."""
    cfg, params, calib = tiny_float
    stats = awq.collect_activation_stats(cfg, params, calib)
    scaled = awq.apply_awq_scales(cfg, params, stats, bits=4, alphas=(0.75,))
    rng = np.random.default_rng(SEED + 1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    y0, _ = M.forward(cfg, params, toks)
    y1, _ = M.forward(cfg, scaled, toks)
    rel = (np.abs(np.asarray(y0) - np.asarray(y1)).max()
           / np.abs(np.asarray(y0)).max())
    assert rel < 2e-3, rel


def test_group_scale_never_increases_weighted_error():
    """alpha=0 (identity) is in the grid, so the chosen scale's
    activation-weighted reconstruction error is <= plain RTN's — and
    strictly better on a skewed-activation construction."""
    rng = np.random.default_rng(SEED + 2)
    k, n = 64, 128
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    m = np.ones(k, np.float32)
    m[:4] = 50.0  # a few salient channels dominate the activations

    def weighted_err(s):
        ql = quantize_linear_weight(jnp.asarray(s[:, None] * w), 2,
                                    group_size=32)
        deq = np.asarray(ql.dequantize(jnp.float32)) / s[:, None]
        return float(np.sum((m[:, None] * (w - deq)) ** 2))

    s = awq._group_scale(m, [w], bits=2, group_size=32,
                         alphas=(0.0, 0.25, 0.5, 0.75, 1.0))
    assert weighted_err(s) <= weighted_err(np.ones(k, np.float32)) + 1e-9
    assert weighted_err(s) < 0.7 * weighted_err(np.ones(k, np.float32))


def test_awq_quantized_model_serves(tiny_float):
    cfg, params, calib = tiny_float
    qp = awq.awq_quantize_params(cfg, params, calib, 2, group_size=32)
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams
    eng = Engine(cfg, qp, EngineConfig(batch_slots=1, max_seq_len=64))
    eng.submit(Request(rid=0, prompt=[1, 2, 3],
                       sampling=SamplingParams(max_new_tokens=4)))
    assert len(eng.run()[0].tokens) == 4


def test_awq_guard_rails(tiny_float):
    cfg, params, calib = tiny_float
    moe_cfg = M.LlamaConfig.tiny(n_experts=4, moe_top_k=2, dtype=jnp.float32)
    moe_params = M.init_params(moe_cfg, jax.random.key(1))
    with pytest.raises(ValueError, match="dense"):
        awq.collect_activation_stats(moe_cfg, moe_params, calib)
    fused = M.fuse_layer_projections(params, cfg)
    with pytest.raises(ValueError, match="fuse"):
        awq.collect_activation_stats(cfg, fused, calib)
