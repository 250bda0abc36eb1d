"""GGUF checkpoint interop: read llama.cpp models, write them back.

GGUF is the llama.cpp ecosystem's container (header + typed metadata KV
+ tensor directory + aligned data section).  This module gives the
framework both directions:

  read_gguf(path)            -> (metadata, {name: _TensorInfo})  low-level
  config_from_gguf(meta)     -> LlamaConfig        (llama.* metadata keys)
  load_gguf(path, ...)       -> (cfg, params)      ready for the engine
  write_gguf(path, cfg, params, quant=...)         export to llama.cpp

Quantized tensor types are repacked NATIVELY, not dequantized:

  Q4_0  blocks of 32 along the input dim: f16 scale d, 16 nibble bytes,
        value = (q - 8) * d  — exactly our affine grouped INT4 with
        group_size=32 and zero_point=8, so codes move bit-for-bit into
        the split-half layout (quant/linear.py) and serve through the
        same fused Pallas kernels as natively-quantized weights.
  Q8_0  blocks of 32: f16 scale + 32 int8 — affine INT8-g32, zp=128
        after the signed->unsigned shift.
  F32/F16/BF16 load as float (quantize with models.llama.quantize_params
        afterwards if desired).
  Q4_1 / K-quants: decoded via dequantization (their float-min offsets
        don't map onto integer zero-points); re-quantize natively after.

Name mapping follows the llama.cpp convention (token_embd, output,
blk.N.attn_{q,k,v,output}, ffn_{gate,up,down}, *_norm).  GGUF stores
llama q/k in the Meta INTERLEAVED rope layout — our internal convention
(loader._permute_rope_cols maps HF half-split to interleaved), so they
load with no permutation.

Format reference: ggml.h / gguf.md (public spec); this is an independent
implementation.  Reference repo anchor: pi-quant's torch adapter is its
only interop surface (python/src/piquant/torch.py) — GGUF extends the
same idea to the llama.cpp ecosystem.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["read_gguf", "load_gguf", "write_gguf", "config_from_gguf",
           "GGML_Q4_0", "GGML_Q8_0", "GGML_F32", "GGML_F16", "GGML_BF16"]

_MAGIC = 0x46554747  # "GGUF" little-endian
_VERSION = 3

# metadata value types
_U8, _I8, _U16, _I16, _U32, _I32, _F32, _BOOL, _STR, _ARR, _U64, _I64, _F64 \
    = range(13)

# ggml tensor dtypes (subset)
GGML_F32, GGML_F16, GGML_Q4_0, GGML_Q4_1 = 0, 1, 2, 3
GGML_Q8_0 = 8
GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 12, 13, 14
GGML_BF16 = 30

_BLOCK = {GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20), GGML_Q8_0: (32, 34),
          GGML_Q4_K: (256, 144), GGML_Q5_K: (256, 176),
          GGML_Q6_K: (256, 210)}


@dataclasses.dataclass
class _TensorInfo:
    name: str
    shape: Tuple[int, ...]   # numpy shape (outermost first)
    ggml_type: int
    offset: int              # into the data section
    nbytes: int


# ---------------------------------------------------------------------------
# low-level reader
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf):  # any buffer protocol object (mmap/bytes)
        self.b = buf
        self.i = 0

    def u(self, fmt: str):
        v = struct.unpack_from("<" + fmt, self.b, self.i)[0]
        self.i += struct.calcsize(fmt)
        return v

    def string(self) -> str:
        n = self.u("Q")
        s = bytes(self.b[self.i:self.i + n]).decode("utf-8")
        self.i += n
        return s

    def value(self, t: int):
        scalar = {_U8: "B", _I8: "b", _U16: "H", _I16: "h", _U32: "I",
                  _I32: "i", _F32: "f", _U64: "Q", _I64: "q", _F64: "d"}
        if t in scalar:
            return self.u(scalar[t])
        if t == _BOOL:
            return bool(self.u("B"))
        if t == _STR:
            return self.string()
        if t == _ARR:
            et = self.u("I")
            n = self.u("Q")
            return [self.value(et) for _ in range(n)]
        raise ValueError(f"unknown gguf value type {t}")


def _numel(shape) -> int:
    n = 1
    for d in shape:
        n *= d
    return n


def read_gguf(path: str) -> Tuple[Dict[str, Any], Dict[str, _TensorInfo],
                                  np.memmap]:
    """Parse header/metadata/tensor directory; returns (metadata, tensors,
    mmap of the data section).  The header is parsed THROUGH a memmap —
    a multi-GB checkpoint is never materialized in RAM (only the pages
    the parser touches)."""
    import mmap as _mmap

    with open(path, "rb") as f:
        head = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    r = _Reader(head)
    if r.u("I") != _MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version = r.u("I")
    if version not in (2, 3):
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors = r.u("Q")
    n_kv = r.u("Q")
    meta: Dict[str, Any] = {}
    for _ in range(n_kv):
        k = r.string()
        t = r.u("I")
        meta[k] = r.value(t)
    infos: Dict[str, _TensorInfo] = {}
    order: List[_TensorInfo] = []
    for _ in range(n_tensors):
        name = r.string()
        nd = r.u("I")
        ne = [r.u("Q") for _ in range(nd)]      # ne[0] = innermost
        gt = r.u("I")
        off = r.u("Q")
        shape = tuple(reversed(ne))             # numpy: outermost first
        numel = _numel(shape)
        if gt in _BLOCK:
            bs, bb = _BLOCK[gt]
            nbytes = numel // bs * bb
        elif gt == GGML_F32:
            nbytes = numel * 4
        elif gt in (GGML_F16, GGML_BF16):
            nbytes = numel * 2
        else:
            raise ValueError(f"tensor {name}: unsupported ggml type {gt}")
        ti = _TensorInfo(name, shape, gt, off, nbytes)
        infos[name] = ti
        order.append(ti)
    align = int(meta.get("general.alignment", 32))
    data_start = (r.i + align - 1) // align * align
    head.close()
    data = np.memmap(path, np.uint8, mode="r", offset=data_start)
    return meta, infos, data


def _raw(data: np.memmap, ti: _TensorInfo) -> np.ndarray:
    return np.asarray(data[ti.offset:ti.offset + ti.nbytes])


def decode_tensor(data: np.memmap, ti: _TensorInfo) -> np.ndarray:
    """Tensor -> float32 numpy (dequantizing block formats)."""
    raw = _raw(data, ti)
    if ti.ggml_type == GGML_F32:
        return raw.view(np.float32).reshape(ti.shape).copy()
    if ti.ggml_type == GGML_F16:
        return raw.view(np.float16).astype(np.float32).reshape(ti.shape)
    if ti.ggml_type == GGML_BF16:
        return (raw.view(np.uint16).astype(np.uint32) << 16).view(
            np.float32).reshape(ti.shape)
    if ti.ggml_type in (GGML_Q4_0, GGML_Q4_1, GGML_Q8_0):
        codes, scale, minv = _decode_blocks(raw, ti)
        n = _numel(ti.shape)
        out = codes.astype(np.float32) * np.repeat(scale, 32)[:n]
        if minv is not None:
            out += np.repeat(minv, 32)[:n]
        return out.reshape(ti.shape)
    if ti.ggml_type == GGML_Q4_K:
        return _dequant_q4k(raw).reshape(ti.shape)
    if ti.ggml_type == GGML_Q5_K:
        return _dequant_q5k(raw).reshape(ti.shape)
    if ti.ggml_type == GGML_Q6_K:
        return _dequant_q6k(raw).reshape(ti.shape)
    raise ValueError(f"unsupported ggml type {ti.ggml_type}")


# ---------------------------------------------------------------------------
# K-quants (super-blocks of 256; llama.cpp's Q4_K_M family).  Decoded to
# float — the dual (d*sc, dmin*m) affine per 32-group has a FLOAT minimum
# that does not map onto our integer zero-points, so K-quant weights take
# the dequantize -> (optionally requantize natively) path.  Layout
# re-derived from the public ggml-quants.c; cross-validated against an
# independent scalar oracle in tests/test_gguf.py (a llama.cpp-produced
# file is the remaining external check — none exists in this image).
# ---------------------------------------------------------------------------

def _q4k_scales(sc12: np.ndarray):
    """block_q4_K.scales[12] (6-bit packed) -> (sc[8], m[8]) uint8 per
    32-element sub-block (ggml get_scale_min_k4)."""
    q = sc12.astype(np.uint8)
    sc = np.empty((q.shape[0], 8), np.uint8)
    m = np.empty((q.shape[0], 8), np.uint8)
    sc[:, :4] = q[:, :4] & 63
    m[:, :4] = q[:, 4:8] & 63
    sc[:, 4:] = (q[:, 8:12] & 0xF) | ((q[:, 0:4] >> 6) << 4)
    m[:, 4:] = (q[:, 8:12] >> 4) | ((q[:, 4:8] >> 6) << 4)
    return sc, m


def _dequant_q4k(raw: np.ndarray) -> np.ndarray:
    """Q4_K: {f16 d, f16 dmin, u8 scales[12], u8 qs[128]} per 256 elems;
    y = d*sc[g]*q - dmin*m[g] over 8 sub-blocks g of 32."""
    blocks = raw.reshape(-1, 144)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, m = _q4k_scales(blocks[:, 4:16])
    qs = blocks[:, 16:144]                       # [nb, 128]
    # group g of 4 (64 elems each): bytes qs[32g:32g+32]; lo nibbles ->
    # elems [64g, 64g+32) (scale idx 2g), hi -> [64g+32, 64g+64) (2g+1)
    q4 = qs.reshape(nb, 4, 32)
    lo = (q4 & 0xF).astype(np.float32)           # [nb, 4, 32]
    hi = (q4 >> 4).astype(np.float32)
    codes = np.stack([lo, hi], axis=2).reshape(nb, 8, 32)  # sub-block major
    scale = d[:, None] * sc.astype(np.float32)   # [nb, 8]
    off = dmin[:, None] * m.astype(np.float32)
    y = codes * scale[:, :, None] - off[:, :, None]
    return y.reshape(-1)


def _dequant_q5k(raw: np.ndarray) -> np.ndarray:
    """Q5_K: {f16 d, f16 dmin, u8 scales[12], u8 qh[32], u8 qs[128]};
    q = (qs nibble) + 16*(qh bit), one qh bit-plane per 32-sub-block
    (the mask doubles per half-group: u1=1<<2g for lo, u2=2<<2g for hi);
    y = d*sc[g]*q - dmin*m[g]."""
    blocks = raw.reshape(-1, 176)
    nb = blocks.shape[0]
    d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc, m = _q4k_scales(blocks[:, 4:16])
    qh = blocks[:, 16:48]                        # [nb, 32]
    qs = blocks[:, 48:176].reshape(nb, 4, 32)    # [nb, 4 groups, 32]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    g_idx = np.arange(4)
    lo_bit = (qh[:, None, :] >> (2 * g_idx)[None, :, None]) & 1
    hi_bit = (qh[:, None, :] >> (2 * g_idx + 1)[None, :, None]) & 1
    codes = np.stack([lo + 16 * lo_bit, hi + 16 * hi_bit],
                     axis=2).reshape(nb, 8, 32).astype(np.float32)
    scale = d[:, None] * sc.astype(np.float32)
    off = dmin[:, None] * m.astype(np.float32)
    return (codes * scale[:, :, None] - off[:, :, None]).reshape(-1)


def _dequant_q6k(raw: np.ndarray) -> np.ndarray:
    """Q6_K: {u8 ql[128], u8 qh[64], i8 scales[16], f16 d} per 256 elems;
    q = ((ql nibble) | (qh 2-bit << 4)) - 32, y = d * scales[sub16] * q."""
    blocks = raw.reshape(-1, 210)
    nb = blocks.shape[0]
    ql = blocks[:, 0:128]
    qh = blocks[:, 128:192]
    scales = blocks[:, 192:208].view(np.int8).astype(np.float32)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32)[:, 0]
    y = np.empty((nb, 256), np.float32)
    for half in range(2):                        # two 128-element halves
        qlh = ql[:, 64 * half:64 * half + 64]
        qhh = qh[:, 32 * half:32 * half + 32]
        sch = scales[:, 8 * half:8 * half + 8]
        l = np.arange(32)
        is_ = l // 16                            # [32] scale sub-index
        q1 = ((qlh[:, :32] & 0xF) | (((qhh >> 0) & 3) << 4)).astype(
            np.int32) - 32
        q2 = ((qlh[:, 32:] & 0xF) | (((qhh >> 2) & 3) << 4)).astype(
            np.int32) - 32
        q3 = ((qlh[:, :32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(
            np.int32) - 32
        q4 = ((qlh[:, 32:] >> 4) | (((qhh >> 6) & 3) << 4)).astype(
            np.int32) - 32
        base = 128 * half
        for qv, pos_off, sc_off in ((q1, 0, 0), (q2, 32, 2), (q3, 64, 4),
                                    (q4, 96, 6)):
            y[:, base + pos_off:base + pos_off + 32] = (
                d[:, None] * sch[:, is_ + sc_off] * qv)
    return y.reshape(-1)


def _decode_blocks(raw: np.ndarray, ti: _TensorInfo):
    """block formats -> (flat SIGNED codes (zp applied), per-block scale f32,
    per-block min or None)."""
    bs, bb = _BLOCK[ti.ggml_type]
    blocks = raw.reshape(-1, bb)
    if ti.ggml_type == GGML_Q8_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
        q = blocks[:, 2:].view(np.int8).astype(np.int32)
        return q.reshape(-1), d, None
    if ti.ggml_type == GGML_Q4_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
        qs = blocks[:, 2:]
        lo = (qs & 0xF).astype(np.int32) - 8
        hi = (qs >> 4).astype(np.int32) - 8
        # ggml block layout: low nibbles are elements 0..15, high 16..31
        q = np.concatenate([lo, hi], axis=1)
        return q.reshape(-1), d, None
    # Q4_1: value = q * d + m
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)[:, 0]
    m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    qs = blocks[:, 4:]
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.concatenate([lo, hi], axis=1)
    return q.reshape(-1), d, m


# ---------------------------------------------------------------------------
# native repack: Q4_0/Q8_0 -> QuantizedLinear (no dequantization)
# ---------------------------------------------------------------------------

def _linear_from_q(raw: np.ndarray, ti: _TensorInfo):
    """2-D ggml weight [n_out, n_in] in Q4_0/Q8_0 -> QuantizedLinear
    [K=n_in, N=n_out] with group_size=32 along K, codes bit-exact."""
    import jax.numpy as jnp

    from piquant_tpu.quant.linear import QuantizedLinear, with_grouped_cache

    n_out, n_in = ti.shape
    if n_in % 32:
        raise ValueError(f"{ti.name}: n_in {n_in} not a 32 multiple")
    codes, scale, _ = _decode_blocks(raw, ti)
    # codes are signed (zp folded out by _decode_blocks); restore the
    # unsigned storage convention: zp = 8 (Q4_0) / 128 (Q8_0)
    if ti.ggml_type == GGML_Q4_0:
        zp = 8
        bits = 4
    else:
        zp = 128
        bits = 8
    ucodes = (codes + zp).reshape(n_out, n_in).astype(np.uint8)  # [N, K]
    g = n_in // 32
    scale_gn = scale.reshape(n_out, g).T            # [G, N]
    codes_kn = ucodes.T                             # [K, N]
    if bits == 4:
        if (n_in // 2) % 32:
            raise ValueError(f"{ti.name}: K/2 must be a group multiple for "
                             "the split-half layout")
        kh = n_in // 2  # split-half pack, host-side numpy
        data_arr = jnp.asarray(codes_kn[:kh] | (codes_kn[kh:] << 4))
    else:
        data_arr = jnp.asarray(codes_kn)
    ql = QuantizedLinear(
        data=data_arr,
        scale=jnp.asarray(scale_gn.astype(np.float32)),
        zero_point=jnp.full((g, n_out), zp, jnp.int32),
        bits=bits, k=n_in, group_size=32)
    return with_grouped_cache(ql)


# ---------------------------------------------------------------------------
# llama.cpp name mapping + config
# ---------------------------------------------------------------------------

def config_from_gguf(meta: Dict[str, Any], dtype=None,
                     vocab_fallback: int = 0):
    """llama.* metadata -> LlamaConfig (dense llama-family architectures)."""
    import jax.numpy as jnp

    from piquant_tpu.models.llama import LlamaConfig

    arch = meta.get("general.architecture", "llama")

    def key(suffix, default=None):
        return meta.get(f"{arch}.{suffix}", default)

    n_heads = int(key("attention.head_count"))
    d_model = int(key("embedding_length"))
    hd = int(key("attention.key_length", d_model // n_heads))
    toks = meta.get("tokenizer.ggml.tokens")
    return LlamaConfig(
        vocab_size=int(key("vocab_size",
                           len(toks) if toks else vocab_fallback)),
        d_model=d_model,
        n_layers=int(key("block_count")),
        n_heads=n_heads,
        n_kv_heads=int(key("attention.head_count_kv", n_heads)),
        d_ff=int(key("feed_forward_length")),
        rope_theta=float(key("rope.freq_base", 10_000.0)),
        rms_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
        max_seq_len=int(key("context_length", 8192)),
        head_dim_override=hd if hd != d_model // n_heads else None,
        rope_interleaved=True,  # GGUF q/k ship in Meta interleaved layout
        dtype=dtype or jnp.bfloat16,
    )


_GGUF_TO_OURS = {
    "attn_q": "wq", "attn_k": "wk", "attn_v": "wv", "attn_output": "wo",
    "ffn_gate": "w1", "ffn_up": "w3", "ffn_down": "w2",
}
_NORMS = {"attn_norm": "attn_norm", "ffn_norm": "mlp_norm"}


def load_gguf(path: str, dtype=None):
    """GGUF file -> (LlamaConfig, params pytree).  Q4_0/Q8_0 linears repack
    natively into QuantizedLinear (zero quality loss, same packed kernels);
    float tensors load as `dtype`; other quantized types dequantize."""
    import jax.numpy as jnp

    meta, infos, data = read_gguf(path)
    cfg = config_from_gguf(meta, dtype=dtype,
                           vocab_fallback=infos["token_embd.weight"].shape[0])
    dt = cfg.dtype

    def dense(ti, transpose=False):
        w = decode_tensor(data, ti)
        return jnp.asarray(w.T if transpose else w, dt)

    def linear(name):
        ti = infos[name]
        if ti.ggml_type in (GGML_Q4_0, GGML_Q8_0) and len(ti.shape) == 2:
            return _linear_from_q(_raw(data, ti), ti)
        return dense(ti, transpose=True)

    params: Dict[str, Any] = {
        "embed": dense(infos["token_embd.weight"]),
        "final_norm": dense(infos["output_norm.weight"]),
        "layers": [],
    }
    params["lm_head"] = (linear("output.weight")
                         if "output.weight" in infos
                         else jnp.asarray(
                             np.asarray(params["embed"]).T, dt))
    for i in range(cfg.n_layers):
        pre = f"blk.{i}."
        layer: Dict[str, Any] = {}
        for gk, ok in _NORMS.items():
            layer[ok] = dense(infos[pre + gk + ".weight"])
        for gk, ok in _GGUF_TO_OURS.items():
            layer[ok] = linear(pre + gk + ".weight")
        params["layers"].append(layer)
    return cfg, params


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self):
        self.out = bytearray()

    def u(self, fmt: str, v):
        self.out += struct.pack("<" + fmt, v)

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u("Q", len(b))
        self.out += b

    def kv(self, key: str, t: int, v):
        self.string(key)
        self.u("I", t)
        scalar = {_U32: "I", _I32: "i", _F32: "f", _U64: "Q"}
        if t in scalar:
            self.u(scalar[t], v)
        elif t == _STR:
            self.string(v)
        elif t == _BOOL:
            self.u("B", int(v))
        else:
            raise ValueError(t)


def _encode_q4_0(w: np.ndarray) -> bytes:
    """float [n_out, n_in] -> Q4_0 blocks (ggml reference quantization:
    d = max-magnitude / -8, q = round(x/d) + 8)."""
    n_out, n_in = w.shape
    x = w.reshape(n_out * n_in // 32, 32).astype(np.float32)
    amax_i = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), amax_i]
    d = maxv / -8.0
    d16 = d.astype(np.float16)
    df = d16.astype(np.float32)
    inv = np.where(df == 0, 0.0, 1.0 / np.where(df == 0, 1.0, df))
    q = np.clip(np.round(x * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    packed = q[:, :16] | (q[:, 16:] << 4)
    blocks = np.concatenate([d16[:, None].view(np.uint8), packed], axis=1)
    return blocks.tobytes()


def _encode_q8_0(w: np.ndarray) -> bytes:
    n_out, n_in = w.shape
    x = w.reshape(n_out * n_in // 32, 32).astype(np.float32)
    d = np.abs(x).max(axis=1) / 127.0
    d16 = d.astype(np.float16)
    df = d16.astype(np.float32)
    inv = np.where(df == 0, 0.0, 1.0 / np.where(df == 0, 1.0, df))
    q = np.clip(np.round(x * inv[:, None]), -127, 127).astype(np.int8)
    blocks = np.concatenate([d16[:, None].view(np.uint8),
                             q.view(np.uint8)], axis=1)
    return blocks.tobytes()


def _export_linear(w) -> np.ndarray:
    """our linear ([K, N] float or QuantizedLinear) -> float [n_out, n_in]"""
    if hasattr(w, "dequantize"):
        import jax.numpy as jnp

        return np.asarray(w.dequantize(jnp.float32)).T
    return np.asarray(w, np.float32).T


def write_gguf(path: str, cfg, params: Dict, quant: str = "q4_0") -> None:
    """Export a (dense-architecture) model to GGUF for llama.cpp.

    quant: "q4_0" | "q8_0" | "f16" | "f32" for the linears; norms and the
    embedding stay f32.  QuantizedLinear weights are dequantized then
    block-quantized to the ggml grid (Q4_0's per-32 symmetric d differs
    from our asymmetric min/max groups, so a lossless code copy is only
    possible for weights that were loaded FROM Q4_0; the roundtrip is
    covered by tests/test_gguf.py)."""
    tensors: List[Tuple[str, np.ndarray, int]] = []  # (name, float w, type)
    tq = {"q4_0": GGML_Q4_0, "q8_0": GGML_Q8_0, "f16": GGML_F16,
          "f32": GGML_F32}[quant]

    def add(name, arr, gt):
        tensors.append((name, np.asarray(arr, np.float32), gt))

    add("token_embd.weight", params["embed"], GGML_F32)
    add("output_norm.weight", params["final_norm"], GGML_F32)
    lm = params["lm_head"]
    add("output.weight", _export_linear(lm), tq)
    for i, layer in enumerate(params["layers"]):
        pre = f"blk.{i}."
        for gk, ok in _NORMS.items():
            add(pre + gk + ".weight", layer[ok], GGML_F32)
        for gk, ok in _GGUF_TO_OURS.items():
            add(pre + gk + ".weight", _export_linear(layer[ok]), tq)

    w = _Writer()
    w.u("I", _MAGIC)
    w.u("I", _VERSION)
    w.u("Q", len(tensors))
    kvs = [
        ("general.architecture", _STR, "llama"),
        ("general.alignment", _U32, 32),
        ("llama.embedding_length", _U32, cfg.d_model),
        ("llama.block_count", _U32, cfg.n_layers),
        ("llama.attention.head_count", _U32, cfg.n_heads),
        ("llama.attention.head_count_kv", _U32, cfg.n_kv_heads),
        ("llama.feed_forward_length", _U32, cfg.d_ff),
        ("llama.context_length", _U32, cfg.max_seq_len),
        ("llama.vocab_size", _U32, cfg.vocab_size),
        ("llama.rope.freq_base", _F32, cfg.rope_theta),
        ("llama.attention.layer_norm_rms_epsilon", _F32, cfg.rms_eps),
    ]
    if cfg.head_dim != cfg.d_model // cfg.n_heads:
        kvs.append(("llama.attention.key_length", _U32, cfg.head_dim))
        kvs.append(("llama.attention.value_length", _U32, cfg.head_dim))
    w.u("Q", len(kvs))
    for k, t, v in kvs:
        w.kv(k, t, v)

    # tensor directory + data
    blobs: List[bytes] = []
    off = 0
    for name, arr, gt in tensors:
        if gt == GGML_Q4_0:
            blob = _encode_q4_0(arr)
        elif gt == GGML_Q8_0:
            blob = _encode_q8_0(arr)
        elif gt == GGML_F16:
            blob = arr.astype(np.float16).tobytes()
        else:
            blob = arr.astype(np.float32).tobytes()
        w.string(name)
        w.u("I", arr.ndim)
        for d in reversed(arr.shape):   # ne[0] = innermost
            w.u("Q", d)
        w.u("I", gt)
        w.u("Q", off)
        pad = -len(blob) % 32
        blobs.append(blob + b"\0" * pad)
        off += len(blob) + pad
    head = bytes(w.out)
    head += b"\0" * (-len(head) % 32)
    with open(path, "wb") as f:
        f.write(head)
        for b in blobs:
            f.write(b)
