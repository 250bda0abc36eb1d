"""Pallas-RDMA quantized ring all-reduce (EQuARX-style, single fused kernel).

The XLA-level rings in `parallel/collectives.py` lower each hop to a
`lax.ppermute` plus separate quantize / dequantize dispatches — XLA inserts
copies between the collective and the compute, and each hop is its own
HLO.  This module fuses the ENTIRE ring — per-hop symmetric int8
quantization, the remote DMA over ICI, and the dequant-ADD accumulation —
into ONE Pallas kernel per device, the schedule EQuARX (PAPERS.md) builds
inside XLA:

  reduce-scatter: P-1 hops; each hop quantizes the running partial to
    int8 codes + one f32 absmax scale, RDMAs both to the right neighbor,
    and dequant-ADDs the received chunk into its own addend (the
    reference's dequant-ADD store op — dequantize.inl:29-31 — applied
    across chips).
  all-gather: the reduced chunk is quantized ONCE at its owner and the
    packed codes are forwarded P-1 hops, so every device reconstructs
    bit-identical replicas (single quantization error, not per-hop).

Wire traffic: 2·(P-1)/P · numel · 1 byte  (+4-byte scales) — 4× less than
a bf16 ring, 8× less than f32.

Flow control: interpret mode (and the CPU test mesh) supports remote DMA
but NOT remote semaphore signaling, so instead of a barrier + slot reuse
the kernel gives every hop a DISTINCT receive slot (2P-2 slots total) and
waits only on local DMA-completion semaphores.  No inter-device barrier is
needed: each RDMA lands in a slot nobody else writes, and the receiver
blocks on its own recv semaphore.  VMEM cost is (2P-2)·chunk bytes — the
wrapper buckets large tensors into `max_chunk_elems`-sized ring chunks
(one kernel dispatch per bucket) exactly like EQuARX buckets its
all-reduce.

Quantization is SYMMETRIC (scale = absmax/127, zero_point = 0): gradients
are zero-centered, and dropping the zero-point halves the scalar side
channel; the asymmetric path stays available in the XLA-level ring.

Tested in interpret mode on the 8-device CPU mesh (tests/test_rdma_ring.py)
— both against `lax.psum` (error bound) and bit-exactly against a numpy
simulation of the same schedule.  Hardware (Mosaic) compilation needs a
real multi-chip slice, which this environment does not have; the kernel is
opt-in behind the stable `quantized_all_reduce` API until then.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_LANE = 128
_SUB = 8  # f32 sublane quantum; chunks are padded to (R, 128) with R % 8 == 0


def _ring_kernel(p: int, axis_name: str, loopback: bool,
                 x_ref, out_ref,
                 send_c, send_s, recv_c, recv_s,
                 send_c_sem, recv_c_sem, send_s_sem, recv_s_sem):
    """SPMD ring all-reduce body; every device runs this same program.

    x_ref:   (P, R, 128) f32 — this device's addend, chunked by future owner.
    out_ref: (P, R, 128) f32 — the all-reduced result (replica-identical).
    send_c:  (2, R, 128) int8  — double-buffered outgoing codes.
    send_s:  (2, 1, 128) f32   — outgoing scale (lane-broadcast).
    recv_c:  (2P-2, R, 128) int8 — one landing slot per hop (no flow control).
    recv_s:  (2P-2, 1, 128) f32

    loopback: route every RDMA to SELF (right = my) — a single-device smoke
    of the full Mosaic lowering (remote-copy descriptors, DMA semaphores,
    slot schedule) for environments without a multi-chip slice; the P=2
    loopback "ring" computes the quantized sum of this device's own two
    chunks, which the self-test checks numerically (VERDICT r3 #9)."""
    pi = jnp.int32(p)  # x64 test mode: keep index math in int32
    my = lax.axis_index(axis_name)
    right = my if loopback else lax.rem(my + 1, pi)

    def quantize(v):
        scale = jnp.max(jnp.abs(v)) / 127.0
        scale = jnp.maximum(scale, jnp.float32(1e-30))
        codes = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
        return codes, scale

    def send(slot: int, par: int):
        """RDMA send buffer parity `par` into the neighbor's slot `slot`."""
        c = pltpu.make_async_remote_copy(
            src_ref=send_c.at[par], dst_ref=recv_c.at[slot],
            send_sem=send_c_sem.at[slot], recv_sem=recv_c_sem.at[slot],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        s = pltpu.make_async_remote_copy(
            src_ref=send_s.at[par], dst_ref=recv_s.at[slot],
            send_sem=send_s_sem.at[slot], recv_sem=recv_s_sem.at[slot],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        c.start(); s.start()
        return c, s

    # ---- phase 1: reduce-scatter (P-1 quantized hops) --------------------
    acc = x_ref[my]                      # running partial for chunk `my`
    pend = [None, None]                  # outstanding send per buffer parity
    for s_ in range(p - 1):
        par = s_ % 2
        if pend[par] is not None:        # reclaim this parity's buffers
            pend[par][0].wait_send(); pend[par][1].wait_send()
        codes, scale = quantize(acc)
        send_c[par] = codes
        send_s[par] = jnp.full((1, _LANE), scale, jnp.float32)
        dmas = send(s_, par)
        dmas[0].wait_recv(); dmas[1].wait_recv()
        own = x_ref[lax.rem(my - jnp.int32(s_ + 1) + pi, pi)]
        acc = own + recv_c[s_].astype(jnp.float32) * recv_s[s_][0, 0]
        pend[par] = dmas

    # ---- phase 2: all-gather (P-1 forwarding hops) -----------------------
    # Quantize the reduced chunk ONCE; every replica dequantizes the same
    # bytes, so outputs are bit-identical across the ring.
    codes_g, scale_g = quantize(acc)
    for pq in pend:                      # drain ALL outstanding sends
        if pq is not None:
            pq[0].wait_send(); pq[1].wait_send()
    send_c[0] = codes_g
    send_s[0] = jnp.full((1, _LANE), scale_g, jnp.float32)
    out_ref[lax.rem(my + 1, pi)] = codes_g.astype(jnp.float32) * scale_g

    base = p - 1
    for s_ in range(p - 1):
        if s_ == 0:
            dmas = send(base, 0)
        else:
            # forward straight out of the previous landing slot — no copy
            c = pltpu.make_async_remote_copy(
                src_ref=recv_c.at[base + s_ - 1], dst_ref=recv_c.at[base + s_],
                send_sem=send_c_sem.at[base + s_], recv_sem=recv_c_sem.at[base + s_],
                device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
            s2 = pltpu.make_async_remote_copy(
                src_ref=recv_s.at[base + s_ - 1], dst_ref=recv_s.at[base + s_],
                send_sem=send_s_sem.at[base + s_], recv_sem=recv_s_sem.at[base + s_],
                device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
            c.start(); s2.start()
            dmas = (c, s2)
        dmas[0].wait_recv(); dmas[1].wait_recv()
        # hop s_ delivers the chunk owned by device (my - s_ - 1): chunk (my - s_)
        out_ref[lax.rem(my - jnp.int32(s_) + pi, pi)] = (
            recv_c[base + s_].astype(jnp.float32) * recv_s[base + s_][0, 0])
        dmas[0].wait_send(); dmas[1].wait_send()


def _pallas_ring(p: int, rows: int, axis_name: str, interpret: bool,
                 loopback: bool = False):
    nslots = 2 * p - 2
    return pl.pallas_call(
        partial(_ring_kernel, p, axis_name, loopback),
        out_shape=jax.ShapeDtypeStruct((p, rows, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, _LANE), jnp.int8),
            pltpu.VMEM((2, 1, _LANE), jnp.float32),
            pltpu.VMEM((nslots, rows, _LANE), jnp.int8),
            pltpu.VMEM((nslots, 1, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        interpret=interpret,
        # no collective_id: it is only for kernels with a custom BARRIER
        # semaphore (Mosaic rejects it otherwise — found by the r5
        # hardware compile probe); this schedule deliberately has no
        # barrier (per-hop distinct landing slots, local DMA sems only)
    )


def rdma_all_reduce_shard(x: Array, axis_name: str, *,
                          max_chunk_elems: int = 65536,
                          interpret: bool = False) -> Array:
    """Fused-kernel quantized ring all-reduce; call INSIDE shard_map.

    `x` is this device's local addend (any shape, f32/bf16); returns the
    int8-ring sum in f32, same shape.  Inputs larger than
    `p * max_chunk_elems` elements are split into buckets, one kernel
    dispatch each (EQuARX-style): the (2P-2)-slot landing scratch costs
    (2P-2) * max_chunk_elems int8 bytes of VMEM, so an unbounded chunk
    would fail at Mosaic compile time.  The default keeps one call's
    scratch + operands under ~6 MB at P=8.  Quantization granularity is
    per (bucket, ring chunk) — smaller buckets mean finer scales.
    """
    if max_chunk_elems % (_SUB * _LANE):
        raise ValueError(f"max_chunk_elems must be a multiple of "
                         f"{_SUB * _LANE}, got {max_chunk_elems}")
    p = lax.axis_size(axis_name)
    shape, n = x.shape, x.size
    flat = x.reshape(-1).astype(jnp.float32)

    def one_call(piece: Array) -> Array:
        m = piece.size
        csize = -(-m // p)                   # ceil
        csize = -(-csize // (_SUB * _LANE)) * (_SUB * _LANE)
        rows = csize // _LANE
        piece = jnp.pad(piece, (0, p * csize - m))
        chunks = piece.reshape(p, rows, _LANE)
        out = _pallas_ring(p, rows, axis_name, interpret)(chunks)
        return out.reshape(-1)[:m]

    per_call = p * max_chunk_elems
    if n <= per_call:
        return one_call(flat).reshape(shape)
    outs = [one_call(flat[off:off + per_call])
            for off in range(0, n, per_call)]
    return jnp.concatenate(outs).reshape(shape)


def rdma_quantized_all_reduce(x: Array, mesh: Mesh, axis_name: str, *,
                              interpret: bool = False) -> Array:
    """Stacked-convention wrapper (same calling style as `quantized_psum`).

    `x` has shape (P, ...): row d is device d's addend.  Returns the
    replicated quantized sum of the rows, shape x.shape[1:].
    """
    if not (x.ndim and x.shape[0] == mesh.shape[axis_name]):
        raise ValueError(
            "rdma_quantized_all_reduce expects x stacked over the mesh axis")

    f = jax.shard_map(
        lambda xs: rdma_all_reduce_shard(xs[0], axis_name,
                                         interpret=interpret)[None],
        mesh=mesh, in_specs=(P(axis_name),), out_specs=P(axis_name),
        check_vma=False,
    )
    out = f(x)          # (P, ...) — replica-identical rows
    return out[0]


def rdma_ring_selftest(rows: int = 256, interpret: bool = False) -> float:
    """Single-device Mosaic smoke of the ring kernel: a P=2 LOOPBACK ring
    (every RDMA targets self) on a 1-device mesh.  Exercises the exact
    lowering a real slice will use — make_async_remote_copy descriptors,
    DMA semaphore arrays, per-hop landing slots, collective_id — without
    multi-chip hardware.  The loopback schedule reduces this device's own
    two chunks, so the numerical check is out[j] ~= x[0] + x[1].

    Returns the max abs error vs the f32 sum (int8-quantization bounded).
    Raises if Mosaic refuses to compile — which is the point: the first
    real-slice run should not be a cold debug (VERDICT r3 #9)."""
    mesh = Mesh(np.array(jax.devices()[:1]), ("ring",))
    x = jax.random.normal(jax.random.key(0), (2, rows, _LANE), jnp.float32)

    def body(xs):
        return _pallas_ring(2, rows, "ring", interpret, loopback=True)(xs)

    f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(), out_specs=P(),
                              check_vma=False))
    out = np.asarray(f(x))
    want = np.asarray(x[0] + x[1])
    err = float(np.abs(out - want[None]).max())
    scale = float(np.abs(want).max()) / 127.0
    assert err <= 2.5 * scale, (err, scale)  # two quantizations + forward
    return err
