"""Weight-only quantized linear layers (INT4 split-half packed / INT8).

The serving-stack materialization of the reference's quantize/dequantize
primitives (BASELINE.json: "weight-only INT4/INT8 serving with fused
dequant+matmul in VMEM").

TPU-native storage layout — "split-half" packing for 4-bit weights:
a weight W[K, N] is stored as bytes B[K//2, N] with
    B[k, n] = (codes[k, n] & 0xF) | (codes[k + K//2, n] << 4).
Unpacking is then PURE ELEMENTWISE (lo = B & 15 -> rows 0..K/2-1,
hi = B >> 4 -> rows K/2..K-1) followed by a sublane-dimension concat —
no lane shuffles, unlike the adjacent-pair wire layout
(reference quantize.inl:37-41) which would need a lane deinterleave that
TPUs can't do cheaply.  The matmul identity
    x @ W = x[:, :K/2] @ deq(lo) + x[:, K/2:] @ deq(hi)
means the MXU never sees the permutation.  `wire_to_split_half` /
`split_half_to_wire` convert to/from the reference wire ABI at checkpoint
boundaries.

Quantization granularity: per-output-channel affine (scale/zp shaped (1, N)),
an extension over the reference's per-tensor scheme that INT4 LLM serving
needs to stay within the 0.1-ppl target; per-tensor remains available
(channelwise=False).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from piquant_tpu.ops.reference import round_half_away

Array = jax.Array


# ---------------------------------------------------------------------------
# split-half packing
# ---------------------------------------------------------------------------

def pack_split_half(codes: Array) -> Array:
    """Pack int4 codes [K, N] -> bytes [K//2, N] (split-half layout)."""
    k = codes.shape[0]
    if k % 2:
        raise ValueError(f"K={k} must be even for split-half packing")
    lo = codes[: k // 2].astype(jnp.uint8) & jnp.uint8(0xF)
    hi = codes[k // 2 :].astype(jnp.uint8) & jnp.uint8(0xF)
    return lo | (hi << 4)


def pack_split_quarter(codes: Array) -> Array:
    """Pack int2 codes [K, N] -> bytes [K//4, N] (split-quarter layout:
    byte row k holds code rows k, k+K/4, k+K/2, k+3K/4 in bit fields
    0-1, 2-3, 4-5, 6-7 — the 2-bit analogue of split-half: unpacking is
    pure elementwise, no lane shuffles)."""
    k = codes.shape[0]
    if k % 4:
        raise ValueError(f"K={k} must be divisible by 4 for split-quarter")
    q = k // 4
    c = codes.astype(jnp.uint8) & jnp.uint8(3)
    return (c[:q] | (c[q:2 * q] << 2) | (c[2 * q:3 * q] << 4)
            | (c[3 * q:] << 6))


def grouped_chunk_factor(k: int, group_size: int,
                         planes: int = 4) -> Optional[int]:
    """Groups-per-plane chunk factor CH for the chunk-grid grouped kernel
    (ops/pallas/qmatmul._wg_chunk_kernel): the kernel streams
    CH*group_size packed rows per grid step, which hold planes*CH complete
    groups (CH per bit-plane; planes = 4 for INT2 split-quarter, 2 for
    INT4 split-half).  CH must divide the per-plane group count and
    planes*CH must meet the bf16 sublane quantum (>=16) for the
    chunk-major scale stream; None if the shape doesn't fit the kernel."""
    if k % (planes * group_size):
        return None
    gp = (k // planes) // group_size
    cands = (8, 4) if planes == 4 else (8,)
    for c in cands:
        if gp % c == 0:
            return c
    return None


@functools.lru_cache(maxsize=None)
def grouped_chunk_perm(k: int, group_size: int, ch: int, planes: int = 4):
    """Chunk-major group order for the kernel's side streams:
    perm[c*planes*CH + p*CH + t] = p*gp + c*CH + t.  Chunk c's packed rows
    [c*CH*gs, (c+1)*CH*gs) hold exactly the groups
    perm[c*planes*CH : (c+1)*planes*CH] (plane p of packed row block
    t*gs.. is group p*gp + c*CH + t)."""
    import numpy as np
    gp = (k // planes) // group_size
    out = np.empty(planes * gp, np.int32)
    i = 0
    for c in range(gp // ch):
        for p in range(planes):
            for t in range(ch):
                out[i] = p * gp + c * ch + t
                i += 1
    return out


def _grouped_cache(scale: Array, zp: Array, k: int, group_size: int,
                   bits: int):
    """Kernel-ready grouped side streams: chunk-major bf16 scales +
    chunk-major INT8 zero-points.  Stored on the QuantizedLinear so the
    per-step decode path streams 3 B/group-entry (2 B scale + 1 B zp)
    instead of casting/gathering (G, N) f32 every call.

    The zero-point rides as the RAW code (0..15 fits int8 exactly); the
    kernel computes the fold term z * s in-register from the same bf16
    scale the code dots use, so the fold error tracks the scale rounding
    exactly — better than the old pre-multiplied zp*scale stream (bf16
    zs leaked a visible fold error for INT4, which forced it to f32 and
    4 B/group; the int8-z form is both smaller and more accurate)."""
    planes = {2: 4, 4: 2}.get(bits)
    if planes is None:
        return None, None
    ch = grouped_chunk_factor(k, group_size, planes)
    if ch is None:
        return None, None
    perm = jnp.asarray(grouped_chunk_perm(k, group_size, ch, planes))
    s_chunk = scale.astype(jnp.bfloat16)[perm]
    z_chunk = zp.astype(jnp.int8)[perm]
    return s_chunk, z_chunk


# back-compat alias (weight_cache imports the int2 name)
def _grouped_int2_cache(scale: Array, zp: Array, k: int, group_size: int):
    return _grouped_cache(scale, zp, k, group_size, 2)


def unpack_split_quarter(packed: Array) -> Array:
    """bytes [K//4, N] -> int32 codes [K, N]."""
    b = packed.astype(jnp.int32)
    return jnp.concatenate([b & 3, (b >> 2) & 3, (b >> 4) & 3, b >> 6], axis=0)


def unpack_split_half(packed: Array, *, signed: bool = False) -> Array:
    """bytes [K//2, N] -> int32 codes [K, N]."""
    b = packed.astype(jnp.int32)
    lo = b & 15
    hi = (b >> 4) & 15
    codes = jnp.concatenate([lo, hi], axis=0)
    if signed:
        codes = jnp.where(codes >= 8, codes - 16, codes)
    return codes


def wire_to_split_quarter(wire: Array, k: int, n: int) -> Array:
    """Reference uint2 wire layout (4 crumbs/byte, LSB-first over the
    flattened [K, N] row-major array — quantize.inl:43-50) -> split-quarter.
    Host-side/one-time (checkpoint load)."""
    flat = wire.reshape(-1)
    crumbs = jnp.stack([(flat >> (2 * i)) & 3 for i in range(4)],
                       axis=1).reshape(-1)[: k * n].astype(jnp.uint8)
    return pack_split_quarter(crumbs.reshape(k, n))


def split_quarter_to_wire(packed: Array) -> Array:
    """Split-quarter [K//4, N] -> reference wire bytes of the [K, N] array."""
    codes = unpack_split_quarter(packed).astype(jnp.uint8).reshape(-1)
    c = codes.reshape(-1, 4)
    return (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)
            ).astype(jnp.uint8)


def wire_to_split_half(wire: Array, k: int, n: int) -> Array:
    """Reference wire layout (adjacent-pair bytes of the flattened [K, N]
    row-major array, low nibble first — quantize.inl:37-41) -> split-half.

    Host-side/one-time (checkpoint load); uses gather-heavy ops freely.
    """
    flat = wire.reshape(-1)
    lo = (flat & 0xF).astype(jnp.uint8)
    hi = (flat >> 4).astype(jnp.uint8)
    codes = jnp.stack([lo, hi], axis=1).reshape(-1)[: k * n].reshape(k, n)
    return pack_split_half(codes)


def split_half_to_wire(packed: Array) -> Array:
    """Split-half [K//2, N] -> reference wire bytes of the [K, N] array."""
    codes = unpack_split_half(packed).astype(jnp.uint8).reshape(-1)
    even = codes[0::2] & 0xF
    odd = codes[1::2] & 0xF
    return (even | (odd << 4)).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# NF4 codebook (non-uniform 4-bit)
# ---------------------------------------------------------------------------

# The QLoRA NormalFloat-4 codebook (Dettmers et al., arXiv:2305.14314):
# quantiles of N(0, 1) normalized to [-1, 1], asymmetric around the exact
# zero at index 7.  Matches bitsandbytes' table bit-for-bit so NF4 weights
# round-trip with bnb checkpoints.
NF4_CODEBOOK = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0)

CODEBOOKS = {"nf4": NF4_CODEBOOK}


def codebook_lut(codebook: str, dtype=jnp.float32) -> Array:
    return jnp.asarray(CODEBOOKS[codebook], dtype)


def codebook_encode(normalized: Array, codebook: str) -> Array:
    """Nearest-codebook-entry indices for values in [-1, 1] (int32 [.., ..]).

    Midpoint thresholds: code = #{i : x > (lut[i] + lut[i+1]) / 2} — exact
    nearest-neighbour for a sorted codebook, vectorized (no argmin over a
    16-way broadcast)."""
    lut = CODEBOOKS[codebook]
    x = normalized.astype(jnp.float32)
    code = jnp.zeros(x.shape, jnp.int32)
    for i in range(len(lut) - 1):
        code = code + (x > (lut[i] + lut[i + 1]) * 0.5).astype(jnp.int32)
    return code


def codebook_decode(codes: Array, codebook: str,
                    dtype=jnp.float32) -> Array:
    """codes int [.., ..] in [0, 15] -> codebook values (gather-free:
    jnp.take lowers to a gather that is fine on CPU but slow inside TPU
    loops; the select chain vectorizes everywhere and is what the Pallas
    kernel uses too)."""
    lut = CODEBOOKS[codebook]
    v = jnp.full(codes.shape, lut[-1], dtype)
    for i in range(len(lut) - 2, -1, -1):
        v = jnp.where(codes == i, jnp.asarray(lut[i], dtype), v)
    return v


# ---------------------------------------------------------------------------
# QuantizedLinear
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedLinear:
    """Packed weight + affine params for y = x @ W.

    data: uint8 [K//4, N] (int2 split-quarter), [K//2, N] (int4
    split-half), or int8 [K, N].
    scale/zp: (1, N) channelwise, (1, 1) per-tensor, or (G, N) group-wise
    (group_size = K // G contraction rows per group), f32 / int32.
    """

    data: Array
    scale: Array
    zero_point: Array
    bits: int          # 2, 4, or 8
    k: int             # logical contraction dim
    group_size: Optional[int] = None
    # kernel-ready grouped side streams (derived, not part of the wire
    # format): chunk-major bf16 scales + chunk-major int8 raw zero-points
    # for the chunk-grid grouped kernel (see _grouped_cache)
    s_chunk: Optional[Array] = None
    z_chunk: Optional[Array] = None
    # non-uniform codebook name ("nf4"); None = affine.  Codebook weights
    # store absmax scales (w = lut[codes] * scale) and a zero zero_point.
    codebook: Optional[str] = None

    def tree_flatten(self):
        return (self.data, self.scale, self.zero_point, self.s_chunk,
                self.z_chunk), (self.bits, self.k, self.group_size,
                             self.codebook)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zp, s_chunk, z_chunk = children
        bits, k, group_size, codebook = aux
        return cls(data, scale, zp, bits, k, group_size, s_chunk, z_chunk,
                   codebook)

    @property
    def n(self) -> int:
        return self.data.shape[-1]

    def _expanded_params(self):
        """scale/zp broadcast to [K or 1, N] float32."""
        s = self.scale.astype(jnp.float32)
        z = self.zero_point.astype(jnp.float32)
        if self.group_size is not None:
            s = jnp.repeat(s, self.group_size, axis=0)
            z = jnp.repeat(z, self.group_size, axis=0)
        return s, z

    def to_wire(self) -> Array:
        """Packed codes in the REFERENCE wire ABI (quantize.inl:37-50:
        adjacent-element bytes of the flattened [K, N] array, low
        nibble/crumb first) — for handing a quantized weight to a
        pi-quant consumer.  Storage is the natural split-quarter/half
        layout, so only the byte interleave differs."""
        if self.codebook is not None:
            raise ValueError(
                f"{self.codebook} weights have no reference wire ABI "
                "(pi-quant's formats are affine; include/piquant.h dtypes)")
        if self.bits == 2:
            return split_quarter_to_wire(self.data)
        if self.bits == 4:
            return split_half_to_wire(self.data)
        return self.data.reshape(-1)

    @classmethod
    def from_wire(cls, wire: Array, scale, zero_point, bits: int, k: int,
                  n: int, group_size: Optional[int] = None) -> "QuantizedLinear":
        """Build from reference-wire packed codes (inverse of to_wire)."""
        if bits == 2:
            data = wire_to_split_quarter(wire, k, n)
        elif bits == 4:
            data = wire_to_split_half(wire, k, n)
        else:
            data = wire.reshape(k, n)
        scale = jnp.asarray(scale)
        zero_point = jnp.asarray(zero_point)
        s_chunk = z_chunk = None
        if bits in (2, 4) and group_size is not None:
            s_chunk, z_chunk = _grouped_cache(scale, zero_point, k,
                                           group_size, bits)
        return cls(data=data, scale=scale, zero_point=zero_point, bits=bits,
                   k=k, group_size=group_size, s_chunk=s_chunk, z_chunk=z_chunk)

    def dequantize(self, dtype=jnp.bfloat16) -> Array:
        """Materialize the full [K, N] float weight (debug / fallback)."""
        if self.bits == 2:
            codes = unpack_split_quarter(self.data)
        elif self.bits == 4:
            codes = unpack_split_half(self.data)
        else:
            codes = self.data.astype(jnp.int32)
        s, z = self._expanded_params()
        if self.codebook is not None:
            w = codebook_decode(codes, self.codebook) * s
        else:
            w = (codes.astype(jnp.float32) - z) * s
        return w.astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedExpertStack:
    """E stacked QuantizedLinear weights with identical geometry
    (MoE experts): data [E, rows, N], scale/zp [E, G-or-1, N].

    The leading axis is the EXPERT-PARALLEL sharding axis — placing
    PartitionSpec("ep", None, None) on it gives each device a contiguous
    block of whole experts (SURVEY.md §2.3: the EP strategy the reference
    lacks).  `expert(i)` returns a 2-D QuantizedLinear view for the fused
    kernels."""

    data: Array
    scale: Array
    zero_point: Array
    bits: int
    k: int
    group_size: Optional[int] = None
    s_chunk: Optional[Array] = None   # [E, G, N] — see QuantizedLinear
    z_chunk: Optional[Array] = None
    codebook: Optional[str] = None

    def tree_flatten(self):
        return (self.data, self.scale, self.zero_point, self.s_chunk,
                self.z_chunk), (self.bits, self.k, self.group_size,
                             self.codebook)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zp, s_chunk, z_chunk = children
        bits, k, group_size, codebook = aux
        return cls(data, scale, zp, bits, k, group_size, s_chunk, z_chunk,
                   codebook)

    @property
    def n_experts(self) -> int:
        return self.data.shape[0]

    @property
    def n(self) -> int:
        return self.data.shape[-1]

    def expert(self, i: int) -> "QuantizedLinear":
        return QuantizedLinear(data=self.data[i], scale=self.scale[i],
                               zero_point=self.zero_point[i], bits=self.bits,
                               k=self.k, group_size=self.group_size,
                               s_chunk=(None if self.s_chunk is None
                                        else self.s_chunk[i]),
                               z_chunk=(None if self.z_chunk is None
                                     else self.z_chunk[i]),
                               codebook=self.codebook)

    @staticmethod
    def stack(qls: "list[QuantizedLinear]") -> "QuantizedExpertStack":
        q0 = qls[0]
        for q in qls[1:]:
            if (q.bits, q.k, q.group_size, q.data.shape, q.codebook) != (
                    q0.bits, q0.k, q0.group_size, q0.data.shape, q0.codebook):
                raise ValueError("experts must share geometry")
        has_cache = all(q.s_chunk is not None for q in qls)
        return QuantizedExpertStack(
            data=jnp.stack([q.data for q in qls]),
            scale=jnp.stack([q.scale for q in qls]),
            zero_point=jnp.stack([q.zero_point for q in qls]),
            bits=q0.bits, k=q0.k, group_size=q0.group_size,
            s_chunk=(jnp.stack([q.s_chunk for q in qls]) if has_cache
                     else None),
            z_chunk=(jnp.stack([q.z_chunk for q in qls]) if has_cache else None),
            codebook=q0.codebook)


def with_grouped_cache(ql: QuantizedLinear) -> QuantizedLinear:
    """Attach (or refresh) the kernel-ready grouped side streams; no-op for
    channelwise/int4+ weights.  Call after building a grouped-INT2
    QuantizedLinear from parts (concat/slice/random init)."""
    if (ql.bits not in (2, 4) or ql.group_size is None
            or ql.codebook is not None):
        return ql
    s_chunk, z_chunk = _grouped_cache(ql.scale, ql.zero_point, ql.k,
                                   ql.group_size, ql.bits)
    return dataclasses.replace(ql, s_chunk=s_chunk, z_chunk=z_chunk)


def quantize_linear_weight(
    w: Array,
    bits=4,                      # 2 | 4 | 8 | "nf4"
    *,
    channelwise: bool = True,
    group_size: Optional[int] = None,
    stochastic: bool = False,
    key: Optional[Array] = None,
) -> QuantizedLinear:
    """Quantize a [K, N] float weight for weight-only inference.

    Affine (scale, zp) per output channel (axis 0 reduced), per tensor, or
    per (group_size x 1) group along the contraction dim (the standard
    INT4-LLM granularity); same scale/zp derivation math as
    ops.reference.compute_quant_params (reference src/piquant.cpp:222-259),
    vectorized over channels/groups.

    bits="nf4" selects the non-uniform NormalFloat-4 codebook (absmax
    scaling, QLoRA arXiv:2305.14314) instead of an affine grid — see
    `_quantize_nf4`.
    """
    if w.ndim != 2:
        raise ValueError("quantize_linear_weight expects a 2-D weight")
    k, n = w.shape
    if bits == "nf4":
        return _quantize_nf4(w, group_size=group_size,
                             channelwise=channelwise)
    if bits not in (2, 4, 8):
        raise ValueError('bits must be 2, 4, 8, or "nf4"')
    qmin, qmax = 0, (1 << bits) - 1
    wf = w.astype(jnp.float32)

    if group_size is not None:
        if k % group_size:
            raise ValueError(f"K={k} not divisible by group_size={group_size}")
        g = k // group_size
        wg = wf.reshape(g, group_size, n)
        rmin = jnp.min(wg, axis=1)   # (G, N)
        rmax = jnp.max(wg, axis=1)
    else:
        axis = 0 if channelwise else None
        rmin = jnp.min(wf, axis=axis, keepdims=True)
        rmax = jnp.max(wf, axis=axis, keepdims=True)
    span = rmax - rmin
    scale = jnp.where(span == 0, 1.0, span / (qmax - qmin)).astype(jnp.float32)
    if group_size is not None and bits in (2, 4):
        # grouped scales stream bf16 to the chunk-grid kernel; rounding the
        # quantizer's scale to bf16 here (before zp/code derivation) makes
        # that stream EXACT instead of a 0.4% rel perturbation vs the f32
        # fallback — a 0.4% coarser scale grid is invisible next to 2/4-bit
        # code error
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    zp = jnp.clip(round_half_away(qmin - rmin / scale), qmin, qmax)
    zp = jnp.where(span == 0, (qmax + qmin) >> 1, zp).astype(jnp.int32)

    if group_size is not None:
        s_full = jnp.repeat(scale, group_size, axis=0)
        z_full = jnp.repeat(zp, group_size, axis=0)
    else:
        s_full, z_full = scale, zp
    r = wf / s_full
    if stochastic:
        if key is None:
            raise ValueError("stochastic quantization requires a key")
        u = jax.random.uniform(key, r.shape, jnp.float32)
        rounded = jnp.floor(r + u)
    else:
        rounded = round_half_away(r)
    codes = jnp.clip(rounded.astype(jnp.int32) + z_full, qmin, qmax)

    if bits == 2:
        data = pack_split_quarter(codes)
    elif bits == 4:
        data = pack_split_half(codes)
    else:
        data = codes.astype(jnp.uint8)
    s_chunk = z_chunk = None
    if bits in (2, 4) and group_size is not None:
        s_chunk, z_chunk = _grouped_cache(scale, zp, k, group_size, bits)
    return QuantizedLinear(data=data, scale=scale, zero_point=zp, bits=bits,
                           k=k, group_size=group_size, s_chunk=s_chunk,
                           z_chunk=z_chunk)


def _quantize_nf4(w: Array, *, group_size: Optional[int] = None,
                  channelwise: bool = True) -> QuantizedLinear:
    """NF4 (NormalFloat-4) weight quantization: absmax scaling + nearest
    entry of the fixed N(0,1)-quantile codebook (QLoRA, arXiv:2305.14314).

    w = NF4_CODEBOOK[codes] * scale, scale = max|w| per group / channel /
    tensor.  Non-uniform grids beat affine INT4 on normally-distributed
    weights (the paper's claim; verified on the proxy in
    tests/test_nf4.py).  Storage is the same split-half packed layout as
    affine INT4; zero_point is kept as zeros for pytree-shape parity."""
    k, n = w.shape
    wf = w.astype(jnp.float32)
    if group_size is not None:
        if k % group_size:
            raise ValueError(f"K={k} not divisible by group_size={group_size}")
        g = k // group_size
        amax = jnp.max(jnp.abs(wf.reshape(g, group_size, n)), axis=1)  # (G,N)
    else:
        axis = 0 if channelwise else None
        amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax).astype(jnp.float32)
    s_full = (jnp.repeat(scale, group_size, axis=0)
              if group_size is not None else scale)
    codes = codebook_encode(wf / s_full, "nf4")
    return QuantizedLinear(data=pack_split_half(codes), scale=scale,
                           zero_point=jnp.zeros(scale.shape, jnp.int32),
                           bits=4, k=k, group_size=group_size,
                           codebook="nf4")


def _matmul_nf4_jnp(x: Array, ql: QuantizedLinear, out_dtype) -> Array:
    """XLA fallback for codebook (NF4) weights: in-register LUT decode of
    the split-half planes -> scaled matmul.  No zero-point fold exists for
    a non-uniform grid, so this is W-A16 numerics like the grouped affine
    path (dequantized bf16 planes on the MXU)."""
    kh = ql.k // 2
    b = ql.data.astype(jnp.int32)
    lo = codebook_decode(b & 15, ql.codebook)            # (kh, N) f32
    hi = codebook_decode((b >> 4) & 15, ql.codebook)
    scale = ql.scale.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if ql.group_size is not None:
        if kh % ql.group_size:
            # group straddles the plane boundary: general (concat) path
            s_full = jnp.repeat(scale, ql.group_size, axis=0)
            w = jnp.concatenate([lo, hi], axis=0) * s_full
            return jnp.dot(xf, w, preferred_element_type=jnp.float32
                           ).astype(out_dtype)
        g = ql.k // ql.group_size
        g2 = g // 2

        def expand(s):  # (g2, N) -> (kh, N)
            return jnp.repeat(s, ql.group_size, axis=0)

        w_lo = lo * expand(scale[:g2])
        w_hi = hi * expand(scale[g2:])
    else:
        w_lo = lo * scale
        w_hi = hi * scale
    acc = jnp.dot(xf[..., :kh], w_lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xf[..., kh:], w_hi,
                        preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


def _matmul_dequant_jnp(x: Array, ql: QuantizedLinear, out_dtype) -> Array:
    """Fallback path: dequantize tile-free and matmul (XLA fuses reasonably).

    Uses the split-half identity so no full-width codes tensor with lane
    shuffles is ever built.  Group-wise weights use per-group code matmuls
    with the zero-point folded per group.
    """
    scale = ql.scale.astype(jnp.float32)
    zp = ql.zero_point.astype(jnp.float32)
    xf = x.astype(jnp.bfloat16)

    if ql.group_size is not None:
        # codes [K, N] -> [G, gs, N]; x [..., K] -> [..., G, gs].
        # f32 operands: CPU XLA lacks bf16 batched dots, and this path is
        # the (non-pallas) fallback anyway.
        if ql.bits == 2:
            codes = unpack_split_quarter(ql.data).astype(jnp.float32)
        elif ql.bits == 4:
            codes = unpack_split_half(ql.data).astype(jnp.float32)
        else:
            codes = ql.data.astype(jnp.float32)
        g = ql.k // ql.group_size
        cg = codes.reshape(g, ql.group_size, ql.n)
        xg = x.astype(jnp.float32).reshape(*x.shape[:-1], g, ql.group_size)
        acc = jnp.einsum("...gk,gkn->...gn", xg, cg,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("...gn,gn->...n", acc, scale)
        xsum_g = jnp.sum(x.astype(jnp.float32).reshape(*x.shape[:-1], g, ql.group_size),
                         axis=-1)
        out = out - jnp.einsum("...g,gn->...n", xsum_g, zp * scale)
        return out.astype(out_dtype)

    if ql.bits == 2:
        b = ql.data.astype(jnp.int32)
        kq = ql.k // 4
        acc = None
        for i, plane in enumerate((b & 3, (b >> 2) & 3, (b >> 4) & 3, b >> 6)):
            part = jnp.dot(xf[..., i * kq:(i + 1) * kq],
                           plane.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    elif ql.bits == 4:
        b = ql.data.astype(jnp.int32)
        lo = (b & 15).astype(jnp.bfloat16)
        hi = ((b >> 4) & 15).astype(jnp.bfloat16)
        kh = ql.k // 2
        acc = jnp.dot(xf[..., :kh], lo, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xf[..., kh:], hi, preferred_element_type=jnp.float32)
    else:
        codes = ql.data.astype(jnp.bfloat16)
        acc = jnp.dot(xf, codes, preferred_element_type=jnp.float32)
    # affine correction: x @ ((c - zp) * s) = (x @ c) * s - (sum_k x) * zp * s
    xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
    out = acc * scale - xsum * (zp.astype(jnp.float32) * scale)
    return out.astype(out_dtype)


def _quantize_act(x: Array):
    """Dynamic per-token symmetric int8 activation quantization."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


ACT_QUANT_MIN_M = 256  # per-token int8 activations only pay off where the
                       # matmul is MXU-bound (prefill); decode stays bf16


def quantized_matmul(
    x: Array,
    ql: QuantizedLinear,
    out_dtype=jnp.bfloat16,
    *,
    act_quant: bool = False,
) -> Array:
    """y = x @ dequant(W), weights stay packed in HBM/VMEM.

    The affine zero-point term is folded analytically:
        x @ ((codes - zp) * scale) = (x @ codes) * scale - (sum x) * zp * scale
    so the MXU consumes raw codes in bf16 — no materialized float weights.
    On TPU, hot shapes route to the Pallas fused kernel (ops/pallas/qmatmul);
    elsewhere this XLA path runs.
    """
    if x.shape[-1] != ql.k:
        raise ValueError(f"x last dim {x.shape[-1]} != weight K {ql.k}")
    import os

    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    # act_quant=True: int8 activations where the matmul is MXU-bound
    # (prefill-sized M >= ACT_QUANT_MIN_M).  act_quant="all": at every M,
    # including decode — pays off for INT2, whose int8-plane kernel halves
    # the unpack+dot cost that bounds INT2 decode (710 vs 380 GB/s
    # weight-stream measured on v5e, ops/pallas/qmatmul.py).
    use_a8 = (bool(act_quant)
              and (ql.group_size is None or ql.s_chunk is not None)
              and ql.bits in (2, 4, 8) and ql.codebook is None
              # W8A8 pays off only where the matmul is MXU-bound: decode
              # stays on the weight-only int8 kernel (traffic-bound)
              and (ql.bits != 8 or m >= ACT_QUANT_MIN_M)
              and (act_quant == "all" or m >= ACT_QUANT_MIN_M))

    if ql.codebook is not None:
        # non-uniform (NF4) weights: no zero-point fold, no int8-plane
        # path — LUT-decode kernel on TPU, LUT einsum elsewhere
        if (jax.default_backend() == "tpu"
                and os.environ.get("PIQUANT_TPU_FORCE_REF", "0") != "1"):
            try:
                from piquant_tpu.ops.pallas import qmatmul as _qmm

                res = _qmm.nf4_matmul(x, ql, out_dtype)
                if res is not None:
                    return res
                if m >= ACT_QUANT_MIN_M:
                    w = ql.dequantize(jnp.bfloat16)
                    y = jnp.dot(x.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32)
                    return y.astype(out_dtype)
            except ImportError:
                pass
        return _matmul_nf4_jnp(x, ql, out_dtype)

    if jax.default_backend() == "tpu" and os.environ.get("PIQUANT_TPU_FORCE_REF", "0") != "1":
        try:
            from piquant_tpu.ops.pallas import qmatmul as _qmm

            if use_a8:
                xq, xs = _quantize_act(x.reshape(m, ql.k))
                a8 = {2: _qmm.w2a8_matmul, 4: _qmm.w4a8_matmul,
                      8: _qmm.w8a8_matmul}[ql.bits]
                res = a8(xq, xs, ql, out_dtype)
                if res is not None:
                    return res.reshape(*lead, ql.n).astype(out_dtype)
            res = _qmm.quantized_matmul(x, ql, out_dtype)
            if res is not None:
                return res
            if ql.group_size is not None and m >= ACT_QUANT_MIN_M:
                # grouped weights at prefill-sized M have no fused kernel;
                # materializing the bf16 weight once and running a dense
                # MXU matmul beats the XLA grouped-einsum fallback by ~8x
                # (INT2-g32 8x1024 prefill 7.9s -> ~1s)
                w = ql.dequantize(jnp.bfloat16)
                y = jnp.dot(x.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
                return y.astype(out_dtype)
        except ImportError:
            pass
    if use_a8:
        # fallback (CPU/tests): same W4A8/W2A8 numerics in plain XLA
        xq, xs = _quantize_act(x.reshape(m, ql.k))
        if ql.group_size is not None:
            # grouped W2A8-g: int8 activations through the grouped-einsum
            # dequant path (per-group scales applied post-accumulation,
            # matching the chunk-grid kernel's math)
            y = _matmul_dequant_jnp(xq.astype(jnp.float32), ql,
                                    jnp.float32) * xs
            return y.reshape(*lead, ql.n).astype(out_dtype)
        b = ql.data.astype(jnp.int32)
        if ql.bits == 2:
            codes = jnp.concatenate(
                [b & 3, (b >> 2) & 3, (b >> 4) & 3, b >> 6],
                axis=0).astype(jnp.float32)
        elif ql.bits == 8:
            codes = b.astype(jnp.float32)
        else:
            codes = jnp.concatenate([b & 15, b >> 4], axis=0).astype(jnp.float32)
        acc = jnp.dot(xq.astype(jnp.float32), codes,
                      preferred_element_type=jnp.float32)
        scale = ql.scale.astype(jnp.float32).reshape(1, -1)
        zs = scale * ql.zero_point.astype(jnp.float32).reshape(1, -1)
        xsum = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
        y = (acc * scale - xsum * zs) * xs
        return y.reshape(*lead, ql.n).astype(out_dtype)
    return _matmul_dequant_jnp(x, ql, out_dtype)
