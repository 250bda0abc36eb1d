"""GGUF interop (interop/gguf.py): reader, writer, native Q4_0/Q8_0 repack.

The writer doubles as the reader's oracle fixture factory: tests write a
tiny llama in each tensor type, read it back, and check (a) the float
path is bit-exact, (b) quantized linears repack NATIVELY into
QuantizedLinear whose dequantization equals the ggml-reference block
dequant (`decode_tensor`), (c) the loaded model runs and tracks the f32
model within quantization error, (d) metadata -> LlamaConfig mapping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.interop.gguf import (GGML_Q4_0, GGML_Q8_0, config_from_gguf,
                                      decode_tensor, load_gguf, read_gguf,
                                      write_gguf)
from piquant_tpu.models import llama as M
from piquant_tpu.quant.linear import QuantizedLinear

SEED = 0x99F


@pytest.fixture(scope="module")
def tiny():
    cfg = M.LlamaConfig(vocab_size=96, d_model=64, n_layers=2, n_heads=2,
                        n_kv_heads=1, d_ff=128, max_seq_len=64,
                        dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(SEED))
    return cfg, params


def test_f32_roundtrip_bit_exact(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "m.gguf")
    write_gguf(path, cfg, params, quant="f32")
    cfg2, p2 = load_gguf(path, dtype=jnp.float32)
    assert (cfg2.vocab_size, cfg2.d_model, cfg2.n_layers, cfg2.n_heads,
            cfg2.n_kv_heads, cfg2.d_ff) == (96, 64, 2, 2, 1, 128)
    assert cfg2.rope_interleaved
    np.testing.assert_array_equal(np.asarray(p2["embed"]),
                                  np.asarray(params["embed"]))
    for li in range(cfg.n_layers):
        for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            np.testing.assert_array_equal(
                np.asarray(p2["layers"][li][k]),
                np.asarray(params["layers"][li][k], np.float32))
        for k in ("attn_norm", "mlp_norm"):
            np.testing.assert_array_equal(
                np.asarray(p2["layers"][li][k]),
                np.asarray(params["layers"][li][k], np.float32))


@pytest.mark.parametrize("quant,gt,bits,zp", [("q4_0", GGML_Q4_0, 4, 8),
                                              ("q8_0", GGML_Q8_0, 8, 128)])
def test_quantized_native_repack(tiny, tmp_path, quant, gt, bits, zp):
    cfg, params = tiny
    path = str(tmp_path / f"m_{quant}.gguf")
    write_gguf(path, cfg, params, quant=quant)
    meta, infos, data = read_gguf(path)
    cfg2, p2 = load_gguf(path, dtype=jnp.float32)
    for li in range(cfg.n_layers):
        for gk, ok in [("attn_q", "wq"), ("ffn_down", "w2")]:
            ql = p2["layers"][li][ok]
            assert isinstance(ql, QuantizedLinear)
            assert (ql.bits, ql.group_size) == (bits, 32)
            assert int(np.asarray(ql.zero_point)[0, 0]) == zp
            # native repack == ggml-reference block dequant, bit-for-bit
            ti = infos[f"blk.{li}.{gk}.weight"]
            assert ti.ggml_type == gt
            want = decode_tensor(data, ti).T       # [K, N]
            got = np.asarray(ql.dequantize(jnp.float32))
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
            # and close to the original float weight (quantization error)
            w0 = np.asarray(params["layers"][li][ok], np.float32)
            step = np.abs(w0).max() / (4 if bits == 4 else 100)
            assert np.abs(got - w0).max() <= step


def test_loaded_model_runs_and_tracks_f32(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "m_q8.gguf")
    write_gguf(path, cfg, params, quant="q8_0")
    cfg2, p2 = load_gguf(path, dtype=jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 96, (2, 12)),
                       jnp.int32)
    base, _ = M.forward(cfg, params, toks)
    got, _ = M.forward(cfg2, p2, toks)
    assert np.isfinite(np.asarray(got)).all()
    # Q8_0 is near-lossless: same argmax at nearly every position
    agree = (np.asarray(base.argmax(-1)) == np.asarray(got.argmax(-1))).mean()
    assert agree >= 0.9, agree


def test_f16_tensor_decode(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "m_f16.gguf")
    write_gguf(path, cfg, params, quant="f16")
    cfg2, p2 = load_gguf(path, dtype=jnp.float32)
    w0 = np.asarray(params["layers"][0]["wq"], np.float32)
    got = np.asarray(p2["layers"][0]["wq"])
    np.testing.assert_allclose(got, w0.astype(np.float16).astype(np.float32),
                               rtol=0, atol=0)


def test_metadata_surface(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "m.gguf")
    write_gguf(path, cfg, params, quant="f32")
    meta, infos, _ = read_gguf(path)
    assert meta["general.architecture"] == "llama"
    assert meta["llama.attention.head_count"] == 2
    assert meta["llama.rope.freq_base"] == pytest.approx(cfg.rope_theta)
    assert infos["token_embd.weight"].shape == (96, 64)
    cfg3 = config_from_gguf(meta, dtype=jnp.float32)
    assert cfg3.n_kv_heads == 1 and cfg3.max_seq_len == cfg.max_seq_len


def test_lm_head_shape_contract(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "m.gguf")
    write_gguf(path, cfg, params, quant="f32")
    _, infos, _ = read_gguf(path)
    assert "output.weight" in infos
    assert infos["output.weight"].shape == (cfg.vocab_size, cfg.d_model)
    cfg2, p2 = load_gguf(path, dtype=jnp.float32)
    assert p2["lm_head"].shape == (cfg.d_model, cfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(p2["lm_head"]),
                                  np.asarray(params["lm_head"], np.float32))
