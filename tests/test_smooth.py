"""SmoothQuant outlier migration (quant/smooth.py): fold exactness,
activation-error reduction on planted outliers, end-to-end W8A8 benefit,
loader method plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant import awq, smooth
from piquant_tpu.quant.linear import _quantize_act, quantize_linear_weight

SEED = 0x51A0


@pytest.fixture(scope="module")
def tiny_float():
    cfg = M.LlamaConfig.tiny(dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(SEED % 89))
    rng = np.random.default_rng(SEED)
    calib = rng.integers(0, cfg.vocab_size, (2, 32))
    return cfg, params, calib


def test_absmax_stats(tiny_float):
    cfg, params, calib = tiny_float
    sa = awq.collect_activation_stats(cfg, params, calib, stat="absmax")
    sm = awq.collect_activation_stats(cfg, params, calib, stat="mean")
    for key in sm:
        assert key in sa
        # max >= mean, pointwise
        assert np.all(sa[key] >= sm[key] - 1e-6), key


def test_fold_is_float_exact(tiny_float):
    cfg, params, calib = tiny_float
    stats = awq.collect_activation_stats(cfg, params, calib, stat="absmax")
    scaled = smooth.apply_smooth_scales(cfg, params, stats, alpha=0.5)
    rng = np.random.default_rng(SEED + 1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    y0, _ = M.forward(cfg, params, toks)
    y1, _ = M.forward(cfg, scaled, toks)
    rel = (np.abs(np.asarray(y0) - np.asarray(y1)).max()
           / np.abs(np.asarray(y0)).max())
    assert rel < 2e-3, rel


def test_migration_reduces_w8a8_error():
    """Planted activation outlier channel: per-token int8 act quant after
    x/s + s*W weights gives a closer int8xint8 product than no smoothing."""
    rng = np.random.default_rng(SEED + 2)
    k, n, m = 128, 256, 16
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    x = rng.normal(0, 1.0, (m, k)).astype(np.float32)
    x[:, 7] *= 80.0          # one outlier channel dominates every token
    exact = x @ w

    def w8a8(xv, wv):
        xq, xs = _quantize_act(jnp.asarray(xv))
        ql = quantize_linear_weight(jnp.asarray(wv), 8)
        deq = np.asarray(ql.dequantize(jnp.float32))
        return np.asarray(xq, np.float32) * np.asarray(xs) @ deq

    base_err = np.abs(w8a8(x, w) - exact).max()
    s = smooth.smooth_scales(np.abs(x).max(0), [w], alpha=0.5)
    mig_err = np.abs(w8a8(x / s, s[:, None] * w) - exact).max()
    assert mig_err < base_err * 0.5, (mig_err, base_err)


def test_quantized_model_closer_after_smoothing(tiny_float):
    """End-to-end: inject an outlier into a norm weight so one channel's
    activations blow up; with act_quant on, the smoothed W8A8 model tracks
    the float model strictly better than the unsmoothed one."""
    cfg, params, calib = tiny_float
    import dataclasses
    params = jax.tree.map(lambda a: a, params)  # shallow copy tree
    params["layers"] = [dict(l) for l in params["layers"]]
    for l in params["layers"]:
        nw = np.asarray(l["mlp_norm"], np.float32).copy()
        nw[3] = 40.0                      # outlier channel into w1/w3
        l["mlp_norm"] = jnp.asarray(nw)

    cfg_aq = dataclasses.replace(cfg, act_quant_decode=True)
    rng = np.random.default_rng(SEED + 3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    yf, _ = M.forward(cfg, params, toks)

    q_plain = M.quantize_params(params, bits=8)
    yp, _ = M.forward(cfg_aq, q_plain, toks)

    stats = awq.collect_activation_stats(cfg, params, calib, stat="absmax")
    smoothed = smooth.apply_smooth_scales(cfg, params, stats, alpha=0.5)
    q_smooth = M.quantize_params(smoothed, bits=8)
    ys, _ = M.forward(cfg_aq, q_smooth, toks)

    err_plain = float(np.abs(np.asarray(yp) - np.asarray(yf)).mean())
    err_smooth = float(np.abs(np.asarray(ys) - np.asarray(yf)).mean())
    assert err_smooth < err_plain, (err_smooth, err_plain)


def test_smoothed_tree_shape_preserved(tiny_float):
    cfg, params, calib = tiny_float
    stats = awq.collect_activation_stats(cfg, params, calib, stat="absmax")
    out = smooth.apply_smooth_scales(cfg, params, stats)
    assert set(out) == set(params)
    for l0, l1 in zip(params["layers"], out["layers"]):
        assert set(l0) == set(l1)
        for k in l0:
            assert l0[k].shape == l1[k].shape


def test_bad_stat_rejected(tiny_float):
    cfg, params, calib = tiny_float
    with pytest.raises(ValueError, match="stat"):
        awq.collect_activation_stats(cfg, params, calib, stat="median")
