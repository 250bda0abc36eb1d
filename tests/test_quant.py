"""Core op tests vs the independent numpy oracle (reference test strategy §4:
two-oracle scheme, randomized sizes with odd tails, fixed seed, stochastic
paths checked to a ±1-step tolerance, roundtrip bound as universal property)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import piquant_tpu as pq
from piquant_tpu import dtypes as dt

import oracle

SEED = 0x9032002
FLOATS = ["f32", "bf16", "f64"]
NARROW_QUANTS = ["uint2", "uint4", "uint8", "int4", "int8"]
WIDE_QUANTS = ["uint16", "int16", "uint32", "int32", "uint64", "int64"]


def _rand_x(rng, n, fname):
    x = rng.uniform(-4.0, 4.0, size=n).astype(np.float32)
    return jnp.asarray(x, dt.DTYPES[fname].storage)


def _sizes(rng, k=4):
    # Odd-tail sizes like test/quant.cpp:38; fixed set so XLA compile-cache
    # entries are shared across the whole parametrized matrix.
    del rng, k
    return [10007, 7, 4096]


# ---------------------------------------------------------------------------
# packing ABI
# ---------------------------------------------------------------------------

def test_pack_abi_uint4_low_nibble_first():
    codes = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    packed = np.asarray(pq.ops.reference.pack_codes(codes, "uint4"))
    assert packed.tolist() == [0x21, 0x43, 0x05]  # low nibble first; tail zeroed


def test_pack_abi_uint2_lsb_first():
    codes = jnp.asarray([1, 2, 3, 0, 1, 1], jnp.int32)
    packed = np.asarray(pq.ops.reference.pack_codes(codes, "uint2"))
    # byte0 = 1 | 2<<2 | 3<<4 | 0<<6 = 0x39 ; byte1 = 1 | 1<<2 = 0x05
    assert packed.tolist() == [0x39, 0x05]


@pytest.mark.parametrize("qname", ["uint2", "uint4", "int4", "uint8", "int8"])
def test_pack_unpack_roundtrip(qname):
    q = dt.DTYPES[qname]
    rng = np.random.default_rng(SEED)
    for n in [1, 2, 3, 4, 5, 8, 31, 1000, 1001]:
        codes = rng.integers(q.qmin, q.qmax + 1, size=n)
        packed = pq.ops.reference.pack_codes(jnp.asarray(codes, jnp.int32), q)
        un = np.asarray(pq.ops.reference.unpack_codes(packed, n, q))
        np.testing.assert_array_equal(un, codes)
        # cross-check against oracle packing (byte-wise: view signed as raw bytes)
        np.testing.assert_array_equal(
            np.asarray(packed).view(np.uint8), oracle.np_pack(codes, q.bits)
        )


# ---------------------------------------------------------------------------
# quantize vs oracle (nearest, exact)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", FLOATS)
@pytest.mark.parametrize("qname", NARROW_QUANTS)
def test_quantize_nearest_matches_oracle(fname, qname):
    rng = np.random.default_rng(SEED)
    q = dt.DTYPES[qname]
    for n in _sizes(rng, 2):
        x = _rand_x(rng, n, fname)
        xnp = np.asarray(x)
        scale, zp = oracle.np_quant_params(np.asarray(x, np.float32), q.qmin, q.qmax)
        got = np.asarray(pq.quantize(x, scale, zp, q, "nearest"))
        acc = np.float64 if fname == "f64" else np.float32
        want_codes = oracle.np_quantize_codes(xnp, scale, zp, q.qmin, q.qmax, acc=acc)
        want = (
            oracle.np_pack(want_codes, q.bits)
            if q.is_packed
            else want_codes.astype(np.dtype(q.storage.name))
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("qname", WIDE_QUANTS)
def test_quantize_nearest_wide_dtypes(qname):
    rng = np.random.default_rng(SEED)
    q = dt.DTYPES[qname]
    n = 4097
    x = jnp.asarray(rng.uniform(-1000, 1000, n), jnp.float32)
    scale, zp = 0.37, 11
    got = np.asarray(pq.quantize(x, scale, zp, q, "nearest")).astype(np.float64)
    want = oracle.np_quantize_codes(np.asarray(x), scale, zp, q.qmin, q.qmax)
    np.testing.assert_allclose(got, np.asarray(want, np.float64), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# roundtrip bound |x - dq(q(x))| <= scale*0.5 + eps (BASELINE universal bound)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", ["f32", "bf16"])
@pytest.mark.parametrize("qname", NARROW_QUANTS)
@pytest.mark.parametrize("round_mode", ["nearest", "stochastic"])
def test_roundtrip_bound(fname, qname, round_mode, key):
    rng = np.random.default_rng(SEED + 1)
    q = dt.DTYPES[qname]
    n = 10007
    x = _rand_x(rng, n, fname)
    scale, zp = pq.compute_quant_params(x, q)
    packed = pq.quantize(x, scale, zp, q, round_mode, key=key)
    dq = pq.dequantize(packed, scale, zp, q, out_dtype=fname, numel=n)
    s = float(scale)
    # nearest: half-step; stochastic: full step. bf16 adds its own representation
    # error of up to ~0.4% of magnitude (test/dequant.cpp uses per-bitwidth bounds).
    step = 0.5 if round_mode == "nearest" else 1.0
    eps = 0.04 if fname == "bf16" else 1e-5
    err = np.abs(np.asarray(x, np.float32) - np.asarray(dq, np.float32))
    assert float(err.max()) <= s * step + eps, (qname, fname, round_mode, err.max(), s)


# ---------------------------------------------------------------------------
# stochastic rounding properties
# ---------------------------------------------------------------------------

def test_stochastic_within_one_step_of_nearest(key):
    rng = np.random.default_rng(SEED)
    x = jnp.asarray(rng.uniform(-2, 2, 8191), jnp.float32)
    scale, zp = 0.01, 127
    qs = np.asarray(pq.quantize(x, scale, zp, "uint8", "stochastic", key=key), np.int64)
    qn = np.asarray(pq.quantize(x, scale, zp, "uint8", "nearest"), np.int64)
    assert np.abs(qs - qn).max() <= 1  # test/quant.cpp:16 stochastic_epsilon


def test_stochastic_unbiased(key):
    # E[dq(q(x))] == x for stochastic rounding — the property the quantized
    # collectives rely on (upgrade over the reference's shared threshold).
    n = 200_000
    x = jnp.full((n,), 0.31337, jnp.float32)
    scale, zp = 0.01, 127
    packed = pq.quantize(x, scale, zp, "uint8", "stochastic", key=key)
    dq = np.asarray(pq.dequantize(packed, scale, zp, "uint8", numel=n))
    assert abs(float(dq.mean()) - 0.31337) < 1e-4


# ---------------------------------------------------------------------------
# dequantize: SET/ADD store operators
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", ["f32", "bf16"])
@pytest.mark.parametrize("qname", ["uint2", "uint4", "uint8"])
def test_dequant_add_matches_set_plus_prefill(fname, qname):
    # The reference tests ADD by prefilling with a constant and subtracting it
    # back (test/dequant.cpp:37-42).
    rng = np.random.default_rng(SEED + 2)
    q = dt.DTYPES[qname]
    n = 9001
    x = _rand_x(rng, n, fname)
    scale, zp = pq.compute_quant_params(x, q)
    packed = pq.quantize(x, scale, zp, q)
    base = jnp.full((n,), 3.5, dt.DTYPES[fname].storage)
    dq_set = pq.dequantize(packed, scale, zp, q, out_dtype=fname, numel=n)
    dq_add = pq.dequantize(
        packed, scale, zp, q, out_dtype=fname, numel=n, reduce_op="add", out=base
    )
    np.testing.assert_allclose(
        np.asarray(dq_add, np.float32),
        np.asarray(base, np.float32) + np.asarray(dq_set, np.float32),
        rtol=0, atol=2e-2 if fname == "bf16" else 1e-6,
    )


def test_add_identity_on_constant_data():
    # quantize -> dequantize(ADD into zeros) ~= original on integer-valued
    # constant data (degenerate scale=1 path, test/quant.cpp:198-217).
    n = 5000
    x = jnp.full((n,), 42.0, jnp.float32)
    scale, zp = pq.compute_quant_params(x, "uint8")
    assert float(scale) == 1.0 and int(zp) == 127  # degenerate rule
    packed = pq.quantize(x, scale, zp, "uint8")
    out = pq.dequantize(
        packed, scale, zp, "uint8", numel=n, reduce_op="add", out=jnp.zeros(n, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


# ---------------------------------------------------------------------------
# requantize (fused)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", ["f32", "bf16"])
@pytest.mark.parametrize("qname", ["uint2", "uint4", "uint8", "int8"])
@pytest.mark.parametrize("reduce_op", ["set", "add"])
def test_requantize_equals_quant_then_dequant(fname, qname, reduce_op):
    rng = np.random.default_rng(SEED + 3)
    q = dt.DTYPES[qname]
    n = 6007
    x = _rand_x(rng, n, fname)
    scale, zp = pq.compute_quant_params(x, q)
    packed = pq.quantize(x, scale, zp, q)
    dq = pq.dequantize(packed, scale, zp, q, out_dtype=fname, numel=n)
    prefill = jnp.full((n,), 1.25, dt.DTYPES[fname].storage)
    out = prefill if reduce_op == "add" else None
    rq = pq.requantize(x, scale, zp, q, "nearest", reduce_op=reduce_op, out=out)
    want = np.asarray(dq, np.float32)
    if reduce_op == "add":
        want = want + np.asarray(prefill, np.float32)
    np.testing.assert_allclose(
        np.asarray(rq, np.float32), want, atol=2e-2 if fname == "bf16" else 1e-6
    )


# ---------------------------------------------------------------------------
# param derivation properties (test/quant_config.cpp:18-52)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fname", ["f32", "bf16"])
@pytest.mark.parametrize("qname", NARROW_QUANTS + ["uint16", "int16"])
def test_quant_params_properties(fname, qname):
    rng = np.random.default_rng(SEED + 4)
    q = dt.DTYPES[qname]
    for _ in range(20):
        n = int(rng.integers(100, 5000))
        x = _rand_x(rng, n, fname)
        scale, zp = pq.compute_quant_params(x, q)
        s, z = float(scale), int(zp)
        assert np.isfinite(s) and s > 0
        assert q.qmin <= z <= q.qmax
        # cross-check vs oracle formula
        so, zo = oracle.np_quant_params(np.asarray(x, np.float32), q.qmin, q.qmax)
        np.testing.assert_allclose(s, so, rtol=1e-6)
        assert abs(z - zo) <= 1


# ---------------------------------------------------------------------------
# QuantizedTensor wrapper + jit/pytree
# ---------------------------------------------------------------------------

def test_quantized_tensor_roundtrip_and_pytree():
    rng = np.random.default_rng(SEED + 5)
    x = jnp.asarray(rng.uniform(-1, 1, (32, 48)), jnp.float32)
    qt = pq.quantize_tensor(x, "uint4")
    assert qt.shape == (32, 48)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    dq = jax.jit(lambda t: t.dequantize())(qt2)
    assert dq.shape == (32, 48)
    s = float(qt.scale)
    assert float(jnp.abs(dq - x).max()) <= s * 0.5 + 1e-5


def test_validation_errors():
    x = jnp.ones((8,), jnp.float32)
    with pytest.raises(ValueError):
        pq.quantize(x, 1.0, 0, "f32")  # target must be quant
    with pytest.raises(ValueError):
        pq.quantize(x.astype(jnp.int32), 1.0, 0, "uint8")  # input must be float
    packed = pq.quantize(x, 1.0, 0, "uint4")
    with pytest.raises(ValueError):
        pq.dequantize(packed, 1.0, 0, "uint4", numel=42)  # exact-size contract
    with pytest.raises(ValueError):
        pq.quantize(x, 1.0, 0, "uint8", "stochastic")  # missing key
    with pytest.raises(ValueError):
        pq.dequantize(packed, 1.0, 0, "uint4", numel=8, reduce_op="add")  # no out
