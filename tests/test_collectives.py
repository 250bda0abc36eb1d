"""Quantized ring-collective tests on the virtual 8-device CPU mesh
(SURVEY §4: multi-chip tests via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from piquant_tpu.parallel import (
    make_mesh,
    quantized_all_gather,
    quantized_all_reduce,
    quantized_psum,
    quantized_reduce_scatter,
)

SEED = 0x9032002


@pytest.fixture(scope="module")
def mesh():
    return make_mesh([("x", -1)])


def _addends(p, n, seed=SEED):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (p, n)).astype(np.float32))


def test_mesh_helper():
    m = make_mesh([("dp", 2), ("tp", -1)])
    assert m.shape["dp"] == 2 and m.shape["tp"] == 4


def test_quantized_reduce_scatter_sum(mesh):
    p = mesh.shape["x"]
    n = 1024
    xs = _addends(p, n)
    want = np.asarray(xs).sum(axis=0)

    f = jax.jit(
        jax.shard_map(
            lambda a: quantized_reduce_scatter(a[0], "x", "uint8", "nearest"),
            mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False,
        )
    )
    got = np.asarray(f(xs))  # concat over devices of their (d+1)%p chunk
    csize = n // p
    got_chunks = got.reshape(p, csize)
    for d in range(p):
        c = (d + 1) % p
        # per-hop quantization error accumulates over <= p-1 hops
        step = 2.0 / 255  # chunk range ~[-4,4] -> scale ~ 8/255
        tol = (p - 1) * 8.0 / 255 * 0.5 + 1e-4
        err = np.abs(got_chunks[d] - want[c * csize : (c + 1) * csize]).max()
        assert err <= tol, (d, err, tol)


def test_quantized_all_gather_orders_shards(mesh):
    p = mesh.shape["x"]
    n = 256
    xs = _addends(p, n, SEED + 1)

    f = jax.jit(
        jax.shard_map(
            lambda a: quantized_all_gather(a[0], "x", "uint8", "nearest")[None, :],
            mesh=mesh, in_specs=(P("x"),), out_specs=P("x", None), check_vma=False,
        )
    )
    got = np.asarray(f(xs))  # (p, p*n): row per device
    want = np.asarray(xs).reshape(-1)
    # every device reconstructs the same values (single quantization per shard)
    for d in range(1, p):
        np.testing.assert_array_equal(got[0], got[d])
    scales = [(np.ptp(np.asarray(xs)[d]) / 255.0) for d in range(p)]
    tol = max(scales) * 0.5 + 1e-4
    assert np.abs(got[0] - want).max() <= tol


@pytest.mark.parametrize("qdtype", ["uint8", "uint4"])
def test_quantized_all_reduce_matches_psum(mesh, qdtype):
    p = mesh.shape["x"]
    n = 1000  # deliberately not divisible by p -> exercises padding
    xs = _addends(p, n, SEED + 2)
    want = np.asarray(xs).sum(axis=0)

    f = jax.jit(
        jax.shard_map(
            lambda a: quantized_all_reduce(a[0], "x", qdtype, "nearest")[None, :],
            mesh=mesh, in_specs=(P("x"),), out_specs=P("x", None), check_vma=False,
        )
    )
    rep = np.asarray(f(xs)).T  # (n, p)
    # all devices agree exactly (single quantization per shard in gather phase)
    for k in range(rep.shape[1]):
        np.testing.assert_array_equal(rep[:, 0], rep[:, k])
    steps = 255 if qdtype == "uint8" else 15
    # error: (p-1) quantized partial-sum hops + 1 gather quantization, each
    # bounded by half a step of a range that grows with the partial sum.
    rng = np.abs(np.asarray(xs)).max() * p * 2
    tol = p * (rng / steps) * 0.5 + 1e-3
    err = np.abs(rep[:, 0] - want).max()
    assert err <= tol, (err, tol)


def test_quantized_all_reduce_stochastic_unbiased(mesh):
    p = mesh.shape["x"]
    n = 8192
    xs = _addends(p, n, SEED + 3)
    want = np.asarray(xs).sum(axis=0)

    f = jax.jit(
        jax.shard_map(
            lambda a, k: quantized_all_reduce(a[0], "x", "uint8", "stochastic", key=k)[None, :],
            mesh=mesh, in_specs=(P("x"), P()), out_specs=P("x", None), check_vma=False,
        )
    )
    got = np.asarray(f(xs, jax.random.key(0)))[0]
    # mean error over many elements ~ 0 (unbiased), while per-element error
    # stays within the deterministic tolerance envelope
    bias = float(np.mean(got - want))
    assert abs(bias) < 0.02, bias


def test_quantized_psum_wrapper(mesh):
    p = mesh.shape["x"]
    xs = _addends(p, 512, SEED + 4)
    got = np.asarray(quantized_psum(xs, mesh, "x", "uint8", "nearest"))
    want = np.asarray(xs).sum(axis=0)
    assert np.abs(got.reshape(-1)[:512] - want).max() < 0.6


def test_one_ppermute_per_hop(mesh):
    """Wire fusion: codes+scale+zp travel as ONE buffer, so each ring hop is
    exactly one ppermute (reduce-scatter: P-1 hops; all-gather: P-1 hops).
    Regression: the scalars used to ride two extra ppermutes per hop."""
    p = mesh.shape["x"]
    n = 64 * p

    def count_ppermutes(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        return str(jaxpr).count("ppermute")

    import jax.numpy as jnp

    rs = jax.shard_map(
        lambda a: quantized_reduce_scatter(a[0], "x", "uint8", "nearest")[None],
        mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False)
    ag = jax.shard_map(
        lambda a: quantized_all_gather(a[0], "x", "uint8", "nearest")[None],
        mesh=mesh, in_specs=(P("x"),), out_specs=P("x"), check_vma=False)
    xs = jnp.zeros((p, n), jnp.float32)
    sh = jnp.zeros((p, 64), jnp.float32)
    assert count_ppermutes(rs, xs) == p - 1
    assert count_ppermutes(ag, sh) == p - 1
