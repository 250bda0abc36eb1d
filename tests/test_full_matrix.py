"""Full dtype-matrix property tests (BASELINE: "stochastic rounding across
full dtype matrix f32/f64 <-> (u)int4/8/16/32/64").

For every (float src x quant dst x round mode): the roundtrip bound
|x - dq(q(x))| <= scale * step + eps holds, stochastic codes sit within one
step of nearest codes, and the stochastic path is unbiased in expectation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import piquant_tpu as pq
from piquant_tpu import dtypes as dt

SEED = 0x9032002
FLOATS = ["f32", "f64", "bf16"]
ALL_QUANTS = ["uint2", "uint4", "int4", "uint8", "int8", "uint16", "int16",
              "uint32", "int32", "uint64", "int64"]


def _x(n, fname, lo=-4, hi=4):
    rng = np.random.default_rng(SEED + n)
    return jnp.asarray(rng.uniform(lo, hi, n).astype(np.float64),
                       dt.DTYPES[fname].storage)


@pytest.mark.parametrize("fname", FLOATS)
@pytest.mark.parametrize("qname", ALL_QUANTS)
@pytest.mark.parametrize("round_mode", ["nearest", "stochastic"])
def test_roundtrip_bound_full_matrix(fname, qname, round_mode, key):
    q = dt.DTYPES[qname]
    n = 4099
    x = _x(n, fname)
    # params chosen so the value range maps inside the code range: for wide
    # types a fixed small scale exercises real rounding without clamping
    if q.bits <= 8:
        scale, zp = pq.compute_quant_params(x, q)
    else:
        scale, zp = 0.001, (q.qmax + q.qmin) // 2
    packed = pq.quantize(x, scale, zp, q, round_mode, key=key)
    out_dtype = fname if fname != "bf16" else "f32"
    dq = pq.dequantize(packed, scale, zp, q, out_dtype=out_dtype, numel=n)
    step = 0.5 if round_mode == "nearest" else 1.0
    eps = 0.02 if fname == "bf16" else 1e-5
    err = np.abs(np.asarray(x, np.float64) - np.asarray(dq, np.float64)).max()
    assert err <= float(scale) * step + eps, (err, float(scale))


@pytest.mark.parametrize("fname", ["f32", "f64"])
@pytest.mark.parametrize("qname", ["uint4", "uint16", "int32", "uint64"])
def test_stochastic_within_one_step_full_matrix(fname, qname, key):
    q = dt.DTYPES[qname]
    n = 2048
    x = _x(n, fname)
    scale, zp = 0.01, (q.qmax + q.qmin) // 2
    qs = pq.quantize(x, scale, zp, q, "stochastic", key=key)
    qn = pq.quantize(x, scale, zp, q, "nearest")
    from piquant_tpu.ops.reference import unpack_codes

    cs = np.asarray(unpack_codes(qs.reshape(-1), n, q), np.float64)
    cn = np.asarray(unpack_codes(qn.reshape(-1), n, q), np.float64)
    assert np.abs(cs - cn).max() <= 1


@pytest.mark.parametrize("qname", ["int16", "uint32", "int64"])
def test_stochastic_unbiased_wide(qname, key):
    q = dt.DTYPES[qname]
    n = 100_000
    x = jnp.full((n,), 0.777, jnp.float32)
    scale, zp = 0.01, (q.qmax + q.qmin) // 2
    packed = pq.quantize(x, scale, zp, q, "stochastic", key=key)
    dq = np.asarray(pq.dequantize(packed, scale, zp, q, numel=n))
    assert abs(float(dq.mean()) - 0.777) < 2e-4
