"""Quantized ring collectives over ICI.

This is the subsystem the reference's dequant ADD store operator was built
for — "useful for ring-reduction operations" (reference README.md:29,
include/piquant.hpp:28-33) — but never shipped: pi-quant has zero
inter-process communication (SURVEY §2.3).  Here it becomes first-class,
TPU-native: `shard_map` + `lax.ppermute` rings where every hop sends PACKED
low-bit codes (uint8/uint4/uint2 wire format) plus their (scale, zero_point),
and the receiver dequantizes with the ADD store operator directly into its
accumulator — exactly the reference's dequant-ADD composition, but across
chips instead of threads.  Cf. EQuARX (PAPERS.md) for the same schedule in
XLA proper.

Design notes
  * Each hop re-derives (scale, zp) from the chunk it is about to send
    (dynamic per-hop quantization).  The packed codes and the two scalars
    travel in ONE fused uint8 wire buffer (scale/zp bitcast to 4 bytes each
    and appended), so every hop is a single ppermute — one ICI transfer
    setup instead of three.
  * Stochastic rounding (per-element PRNG) keeps the multi-hop sum unbiased;
    nearest rounding is available for deterministic runs.
  * Ring reduce-scatter (P-1 quantized hops) + ring all-gather (P-1 quantized
    hops): total bytes over the wire = 2 * (P-1)/P * numel * bits/8, a
    32/bits-x reduction vs an fp32 ring.
  * All functions must run INSIDE shard_map (they use axis_name); the
    `quantized_psum` convenience wraps one for you.

These run unchanged on the test CPU mesh and on a real ICI ring; a Pallas
RDMA双-buffered variant can later slot in behind the same API.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from piquant_tpu import api as _api
from piquant_tpu.dtypes import QDType, dtype_of, packed_numel

Array = jax.Array


def _axis_size(axis_name: str) -> int:
    return lax.axis_size(axis_name)


def _ring_perm(axis_name: str, shift: int = 1):
    n = _axis_size(axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def _quantize_chunk(
    chunk: Array,
    dt: QDType,
    round_mode: str,
    key: Optional[Array],
) -> Array:
    """Per-hop dynamic quantization of one chunk -> fused wire buffer.

    Wire layout: [packed codes | scale f32 as 4 bytes | zp i32 as 4 bytes],
    all uint8 — one ppermute moves the whole hop.  Routed through the
    dispatch layer (`piquant_tpu.api`), so the Pallas kernels run on TPU."""
    if dt.storage.itemsize != 1:
        raise ValueError(
            f"quantized collectives use a byte wire format; got {dt.name} "
            f"(storage {dt.storage}) — use uint8/int8/uint4/uint2")
    scale, zp = _api.compute_quant_params(chunk, dt)
    packed = _api.quantize(chunk, scale, zp, dt, round_mode, key=key)
    sb = lax.bitcast_convert_type(scale.astype(jnp.float32).reshape(1),
                                  jnp.uint8).reshape(-1)
    zb = lax.bitcast_convert_type(zp.astype(jnp.int32).reshape(1),
                                  jnp.uint8).reshape(-1)
    return jnp.concatenate([packed.view(jnp.uint8), sb, zb])


def _wire_split(wire: Array, numel: int, dt: QDType) -> Tuple[Array, Array, Array]:
    """Fused wire buffer -> (packed, scale, zp)."""
    pb = packed_numel(numel, dt)
    packed = wire[:pb] if dt.is_packed else wire[:pb].view(dt.storage)
    scale = lax.bitcast_convert_type(wire[pb:pb + 4], jnp.float32).reshape(1)
    zp = lax.bitcast_convert_type(wire[pb + 4:pb + 8], jnp.int32).reshape(1)
    return packed, scale, zp


def _dequantize_chunk(
    packed: Array,
    scale: Array,
    zp: Array,
    numel: int,
    dt: QDType,
    out_dtype,
    *,
    add_to: Optional[Array] = None,
) -> Array:
    if add_to is not None:
        return _api.dequantize(packed, scale, zp, dt, out_dtype=out_dtype,
                               numel=numel, reduce_op="add",
                               out=add_to.reshape(-1))
    return _api.dequantize(packed, scale, zp, dt, out_dtype=out_dtype,
                           numel=numel)


def _send_recv(x: Array, axis_name: str) -> Array:
    """One ring hop: every device sends to its right neighbor."""
    return lax.ppermute(x, axis_name, _ring_perm(axis_name))


def _fold_key(key: Optional[Array], axis_name: str, step: int) -> Optional[Array]:
    if key is None:
        return None
    k = jax.random.fold_in(key, lax.axis_index(axis_name))
    return jax.random.fold_in(k, step)


# ---------------------------------------------------------------------------
# ring reduce-scatter
# ---------------------------------------------------------------------------

def quantized_reduce_scatter(
    x: Array,
    axis_name: str,
    qdtype: Union[QDType, str] = "uint8",
    round_mode: str = "stochastic",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Ring reduce-scatter with quantized hops; call inside shard_map.

    `x` is this device's full-size local addend, flat, with
    x.size % axis_size == 0.  Returns this device's reduced shard
    (x.size / P elements): shard d of the sum over all devices.

    Schedule: at step s (s = 0..P-2) device d quantizes its running partial
    for chunk (d - s) mod P, sends it right; receives chunk (d - s - 1) mod P
    and dequant-ADDs its own addend into it.  After P-1 steps device d holds
    the complete sum of chunk (d + 1) mod P.
    """
    dt = dtype_of(qdtype)
    nper = x.size
    p = _axis_size(axis_name)
    if nper % p:
        raise ValueError(f"x.size={nper} not divisible by axis size {p}")
    csize = nper // p
    chunks = x.reshape(p, csize)
    d = lax.axis_index(axis_name)

    # running partial: start with own chunk (d - 0)
    acc = jnp.take(chunks, (d) % p, axis=0)
    for s in range(p - 1):
        kq = _fold_key(key, axis_name, s)
        wire = _quantize_chunk(acc, dt, round_mode, kq)
        wire = _send_recv(wire, axis_name)      # ONE ppermute per hop
        packed, scale, zp = _wire_split(wire, csize, dt)
        # after receive, this device works on chunk (d - s - 1) mod p
        own = jnp.take(chunks, (d - s - 1) % p, axis=0)
        acc = _dequantize_chunk(
            packed, scale, zp, csize, dt, dtype_of(x.dtype), add_to=own
        )
    # acc now holds the full sum of chunk (d - (p-1)) mod p == (d + 1) mod p
    return acc


# ---------------------------------------------------------------------------
# ring all-gather
# ---------------------------------------------------------------------------

def quantized_all_gather(
    shard: Array,
    axis_name: str,
    qdtype: Union[QDType, str] = "uint8",
    round_mode: str = "nearest",
    *,
    key: Optional[Array] = None,
    shard_index_of: Optional[int] = None,
) -> Array:
    """Ring all-gather of per-device shards with quantized hops.

    Each device contributes `shard` (equal sizes); returns the concatenation
    ordered by device index, shape (P * shard.size,).  Each shard is
    quantized ONCE at its source; hops forward the packed bytes unchanged, so
    every device reconstructs bit-identical values (single quantization
    error, not per-hop).
    """
    dt = dtype_of(qdtype)
    p = _axis_size(axis_name)
    csize = shard.size
    d = lax.axis_index(axis_name)
    kq = _fold_key(key, axis_name, 10_000)
    wire = _quantize_chunk(shard.reshape(-1), dt, round_mode, kq)

    out_wire = jnp.zeros((p, wire.size), jnp.uint8)
    src = d
    for s in range(p):
        out_wire = out_wire.at[src].set(wire)
        if s == p - 1:
            break
        wire = _send_recv(wire, axis_name)      # ONE ppermute per hop
        src = (src - 1) % p  # after a right-hop we hold the left neighbor's shard

    # dequantize all shards in ONE vectorized dispatch (vmap over the shard
    # rows — the per-device Python loop of separate dequant calls cost P
    # kernel launches)
    def dq(row):
        packed, scale, zp = _wire_split(row, csize, dt)
        return _dequantize_chunk(packed, scale, zp, csize, dt,
                                 dtype_of(shard.dtype))

    parts = jax.vmap(dq)(out_wire)  # [P, csize]
    return parts.reshape(-1)


# ---------------------------------------------------------------------------
# all-reduce = reduce-scatter + all-gather
# ---------------------------------------------------------------------------

def quantized_all_reduce(
    x: Array,
    axis_name: str,
    qdtype: Union[QDType, str] = "uint8",
    round_mode: str = "stochastic",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Quantized ring all-reduce (sum) of `x` across `axis_name`.

    Drop-in for lax.psum with ~bits/32 wire traffic.  Shape-preserving.
    """
    shape = x.shape
    flat = x.reshape(-1)
    p = _axis_size(axis_name)
    pad = (-flat.size) % p
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    shard = quantized_reduce_scatter(flat, axis_name, qdtype, round_mode, key=key)
    full = quantized_all_gather(shard, axis_name, qdtype, "nearest", key=key)
    # reduce-scatter leaves device d holding chunk (d+1) mod p, and all-gather
    # writes by holder index — undo the +1 rotation.
    full = jnp.roll(full.reshape(p, -1), 1, axis=0).reshape(-1)
    if pad:
        full = full[: x.size]
    return full.reshape(shape)


def quantized_psum(
    x: Array,
    mesh: Mesh,
    axis_name: str,
    qdtype: Union[QDType, str] = "uint8",
    round_mode: str = "stochastic",
    *,
    key: Optional[Array] = None,
) -> Array:
    """Convenience: run quantized_all_reduce over replicated-per-device data.

    `x` must be sharded (or shardable) so each device holds its own addend of
    identical shape; returns the quantized sum, replicated.
    """
    if not (x.ndim and x.shape[0] == mesh.shape[axis_name]):
        raise ValueError(
            "quantized_psum expects x stacked over the mesh axis: shape[0] == axis size"
        )

    # The all-gather phase leaves every device with bit-identical values, but
    # the replication tracker cannot prove that — hence check_vma=False.
    if key is None:
        f = jax.shard_map(
            lambda xs: quantized_all_reduce(xs[0], axis_name, qdtype, round_mode),
            mesh=mesh, in_specs=(P(axis_name),), out_specs=P(), check_vma=False,
        )
        return f(x)
    f = jax.shard_map(
        lambda xs, k: quantized_all_reduce(xs[0], axis_name, qdtype, round_mode, key=k),
        mesh=mesh, in_specs=(P(axis_name), P()), out_specs=P(), check_vma=False,
    )
    return f(x, key)
