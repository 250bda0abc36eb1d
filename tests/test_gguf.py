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


def _oracle_q4k(block: np.ndarray) -> np.ndarray:
    """Independent scalar re-implementation of ggml dequantize_row_q4_K
    (per-element loop, distinct from the module's vectorized decode)."""
    d = block[0:2].copy().view(np.float16).astype(np.float32)[0]
    dmin = block[2:4].copy().view(np.float16).astype(np.float32)[0]
    q = block[4:16]
    qs = block[16:144]
    y = np.zeros(256, np.float32)
    yi, qi, is_ = 0, 0, 0
    for _ in range(0, 256, 64):
        def scale_min(j):
            if j < 4:
                return q[j] & 63, q[j + 4] & 63
            return ((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4),
                    (q[j + 4] >> 4) | ((q[j] >> 6) << 4))

        sc, m = scale_min(is_)
        for l in range(32):
            y[yi] = d * sc * (qs[qi + l] & 0xF) - dmin * m
            yi += 1
        sc, m = scale_min(is_ + 1)
        for l in range(32):
            y[yi] = d * sc * (qs[qi + l] >> 4) - dmin * m
            yi += 1
        qi += 32
        is_ += 2
    return y


def _oracle_q6k(block: np.ndarray) -> np.ndarray:
    """Independent scalar re-implementation of ggml dequantize_row_q6_K."""
    ql = block[0:128]
    qh = block[128:192]
    sc = block[192:208].view(np.int8)
    d = block[208:210].copy().view(np.float16).astype(np.float32)[0]
    y = np.zeros(256, np.float32)
    for n in range(2):
        for l in range(32):
            is_ = l // 16
            b = 128 * n
            q1 = int((ql[64 * n + l] & 0xF) | (((qh[32 * n + l] >> 0) & 3) << 4)) - 32
            q2 = int((ql[64 * n + l + 32] & 0xF) | (((qh[32 * n + l] >> 2) & 3) << 4)) - 32
            q3 = int((ql[64 * n + l] >> 4) | (((qh[32 * n + l] >> 4) & 3) << 4)) - 32
            q4 = int((ql[64 * n + l + 32] >> 4) | (((qh[32 * n + l] >> 6) & 3) << 4)) - 32
            y[b + l] = d * sc[8 * n + is_ + 0] * q1
            y[b + l + 32] = d * sc[8 * n + is_ + 2] * q2
            y[b + l + 64] = d * sc[8 * n + is_ + 4] * q3
            y[b + l + 96] = d * sc[8 * n + is_ + 6] * q4
    return y


def test_q4k_q6k_decode_matches_scalar_oracle():
    """K-quant decode vs an independent per-element oracle on random raw
    blocks (d/dmin fields constrained to sane f16s)."""
    from piquant_tpu.interop.gguf import _dequant_q4k, _dequant_q6k

    rng = np.random.default_rng(0x6B)
    nb = 7
    q4 = rng.integers(0, 256, (nb, 144)).astype(np.uint8)
    sane = (rng.normal(0, 0.01, (nb, 2)).astype(np.float16)).view(np.uint8)
    q4[:, 0:4] = sane.reshape(nb, 4)
    got = _dequant_q4k(q4.reshape(-1)).reshape(nb, 256)
    want = np.stack([_oracle_q4k(q4[i]) for i in range(nb)])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)

    q6 = rng.integers(0, 256, (nb, 210)).astype(np.uint8)
    q6[:, 208:210] = (rng.normal(0, 0.01, (nb, 1)).astype(np.float16)
                      ).view(np.uint8).reshape(nb, 2)
    got6 = _dequant_q6k(q6.reshape(-1)).reshape(nb, 256)
    want6 = np.stack([_oracle_q6k(q6[i]) for i in range(nb)])
    np.testing.assert_allclose(got6, want6, rtol=1e-6, atol=0)


def test_q4k_tensor_through_reader(tiny, tmp_path):
    """A hand-built GGUF carrying a Q4_K tensor loads through read_gguf/
    decode_tensor (nbytes bookkeeping + block math end to end)."""
    import struct

    from piquant_tpu.interop.gguf import GGML_Q4_K, _dequant_q4k

    rng = np.random.default_rng(0x6C)
    n_out, n_in = 4, 256
    raw = rng.integers(0, 256, (n_out * n_in // 256, 144)).astype(np.uint8)
    raw[:, 0:4] = (rng.normal(0, 0.01, (raw.shape[0], 2))
                   .astype(np.float16)).view(np.uint8).reshape(-1, 4)
    blob = raw.tobytes()

    out = bytearray()
    out += struct.pack("<IIQQ", 0x46554747, 3, 1, 1)
    key = b"general.alignment"
    out += struct.pack("<Q", len(key)) + key + struct.pack("<II", 4, 32)
    name = b"w.weight"
    out += struct.pack("<Q", len(name)) + name
    out += struct.pack("<I", 2)                       # n_dims
    out += struct.pack("<QQ", n_in, n_out)            # ne0 (inner), ne1
    out += struct.pack("<IQ", GGML_Q4_K, 0)
    pad = -len(out) % 32
    out += b"\0" * pad + blob
    path = str(tmp_path / "k.gguf")
    with open(path, "wb") as f:
        f.write(out)

    from piquant_tpu.interop.gguf import decode_tensor, read_gguf

    meta, infos, data = read_gguf(path)
    ti = infos["w.weight"]
    assert ti.shape == (n_out, n_in) and ti.nbytes == len(blob)
    got = decode_tensor(data, ti)
    want = _dequant_q4k(raw.reshape(-1)).reshape(n_out, n_in)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _oracle_q5k(block: np.ndarray) -> np.ndarray:
    """Independent scalar re-implementation of ggml dequantize_row_q5_K."""
    d = block[0:2].copy().view(np.float16).astype(np.float32)[0]
    dmin = block[2:4].copy().view(np.float16).astype(np.float32)[0]
    q = block[4:16]
    qh = block[16:48]
    ql = block[48:176]
    y = np.zeros(256, np.float32)

    def scale_min(j):
        if j < 4:
            return q[j] & 63, q[j + 4] & 63
        return ((q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4),
                (q[j + 4] >> 4) | ((q[j] >> 6) << 4))

    yi, qi, is_ = 0, 0, 0
    u1, u2 = 1, 2
    for _ in range(0, 256, 64):
        sc, m = scale_min(is_)
        for l in range(32):
            y[yi] = d * sc * ((ql[qi + l] & 0xF) + (16 if qh[l] & u1 else 0)) - dmin * m
            yi += 1
        sc, m = scale_min(is_ + 1)
        for l in range(32):
            y[yi] = d * sc * ((ql[qi + l] >> 4) + (16 if qh[l] & u2 else 0)) - dmin * m
            yi += 1
        qi += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return y


def test_q5k_decode_matches_scalar_oracle():
    from piquant_tpu.interop.gguf import _dequant_q5k

    rng = np.random.default_rng(0x5B)
    nb = 6
    q5 = rng.integers(0, 256, (nb, 176)).astype(np.uint8)
    q5[:, 0:4] = (rng.normal(0, 0.01, (nb, 2)).astype(np.float16)
                  ).view(np.uint8).reshape(nb, 4)
    got = _dequant_q5k(q5.reshape(-1)).reshape(nb, 256)
    want = np.stack([_oracle_q5k(q5[i]) for i in range(nb)])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
