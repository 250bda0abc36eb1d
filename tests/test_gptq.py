"""GPTQ (quant/gptq.py): error-compensation beats RTN on correlated
inputs, grid byte-compatibility with the runtime, guard rails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant.gptq import (collect_hessians, gptq_quantize_linear,
                                    gptq_quantize_params)
from piquant_tpu.quant.linear import quantize_linear_weight

SEED = 0x9032002


def _correlated_inputs(rng, m, k, rank=8):
    base = rng.normal(0, 1, (m, rank))
    return (base @ rng.normal(0, 1, (rank, k))
            + 0.3 * rng.normal(0, 1, (m, k))).astype(np.float32)


@pytest.mark.parametrize("bits,gs", [(2, 32), (2, None), (4, 32), (8, None)])
def test_gptq_beats_rtn_output_error(bits, gs):
    rng = np.random.default_rng(SEED + bits)
    k, n = 64, 96
    x = _correlated_inputs(rng, 512, k)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    h = x.T @ x

    def out_err(ql):
        dq = np.asarray(ql.dequantize(jnp.float32))
        return float(np.linalg.norm(x @ (w - dq)))

    e_rtn = out_err(quantize_linear_weight(jnp.asarray(w), bits,
                                           group_size=gs))
    e_gptq = out_err(gptq_quantize_linear(w, h, bits, group_size=gs))
    assert e_gptq < 0.7 * e_rtn, (e_gptq, e_rtn)


def test_gptq_act_order_channelwise():
    rng = np.random.default_rng(SEED + 11)
    k, n = 64, 96
    x = _correlated_inputs(rng, 512, k)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    h = x.T @ x
    plain = gptq_quantize_linear(w, h, 2)
    ordered = gptq_quantize_linear(w, h, 2, act_order=True)

    def out_err(ql):
        return float(np.linalg.norm(
            x @ (w - np.asarray(ql.dequantize(jnp.float32)))))

    # act-order must not be (meaningfully) worse; usually better
    assert out_err(ordered) < out_err(plain) * 1.05
    with pytest.raises(ValueError, match="act_order"):
        gptq_quantize_linear(w, h, 2, group_size=32, act_order=True)


def test_gptq_grid_is_runtime_compatible():
    """The produced QuantizedLinear serves through quantized_matmul and
    its grouped caches exist, exactly like an RTN-built one."""
    from piquant_tpu.quant.linear import _matmul_dequant_jnp

    rng = np.random.default_rng(SEED + 21)
    k, n = 128, 256
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    h = np.eye(k)  # identity Hessian -> per-row plain rounding on the grid
    ql = gptq_quantize_linear(w, h, 2, group_size=32)
    rtn = quantize_linear_weight(jnp.asarray(w), 2, group_size=32)
    # grouped-cache presence matches RTN's for the same geometry
    assert (ql.s_chunk is None) == (rtn.s_chunk is None)
    x = jnp.asarray(rng.normal(0, 1, (4, k)), jnp.float32)
    y = _matmul_dequant_jnp(x, ql, jnp.float32)
    assert np.isfinite(np.asarray(y)).all()
    # identity Hessian + same grid == RTN codes
    np.testing.assert_array_equal(np.asarray(ql.data), np.asarray(rtn.data))
    np.testing.assert_allclose(np.asarray(ql.scale), np.asarray(rtn.scale))


def test_gptq_model_level_and_guard_rails():
    cfg = M.LlamaConfig.tiny(dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(3))
    rng = np.random.default_rng(SEED + 31)
    calib = rng.integers(0, cfg.vocab_size, (2, 32))
    hs = collect_hessians(cfg, params, calib)
    assert (0, "wo") in hs and (1, "w2") in hs  # non-foldable linears too
    qp = gptq_quantize_params(cfg, params, calib, 4, group_size=32,
                              hessians=hs)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    y, _ = M.forward(cfg, qp, toks)
    assert np.isfinite(np.asarray(y)).all()

    moe_cfg = M.LlamaConfig.tiny(n_experts=4, moe_top_k=2, dtype=jnp.float32)
    with pytest.raises(ValueError, match="dense"):
        collect_hessians(moe_cfg, M.init_params(moe_cfg, jax.random.key(4)),
                         calib)
