"""Native host runtime tests: C++ kernels vs the same numpy oracle used for
the jnp ops (two-oracle scheme, SURVEY §4)."""

import numpy as np
import pytest

import oracle

from piquant_tpu.runtime import HostContext, host_available

pytestmark = pytest.mark.skipif(not host_available(), reason="native lib unavailable")

SEED = 0x9032002
QINFOS = {
    "uint2": (2, 0, 3, False),
    "uint4": (4, 0, 15, False),
    "int4": (4, -8, 7, True),
    "uint8": (8, 0, 255, False),
    "int8": (8, -128, 127, True),
    "uint16": (16, 0, 65535, False),
    "int16": (16, -32768, 32767, True),
}


@pytest.fixture(scope="module")
def ctx():
    return HostContext(num_threads=4)


@pytest.mark.parametrize("qname", list(QINFOS))
def test_host_quantize_matches_oracle(ctx, qname):
    bits, qmin, qmax, signed = QINFOS[qname]
    rng = np.random.default_rng(SEED)
    for n in [10007, 7, 1, 4096]:
        x = rng.uniform(-4, 4, n).astype(np.float32)
        scale, zp = oracle.np_quant_params(x, qmin, qmax)
        got = ctx.quantize(x, scale, zp, qname)
        codes = oracle.np_quantize_codes(x, scale, zp, qmin, qmax)
        if bits < 8:
            want = oracle.np_pack(codes, bits)
            np.testing.assert_array_equal(got.view(np.uint8), want)
        else:
            np.testing.assert_array_equal(got.astype(np.int64), codes)


@pytest.mark.parametrize("qname", ["uint2", "uint4", "int4", "uint8", "int8"])
@pytest.mark.parametrize("reduce_op", ["set", "add"])
def test_host_dequantize(ctx, qname, reduce_op):
    bits, qmin, qmax, signed = QINFOS[qname]
    rng = np.random.default_rng(SEED + 1)
    n = 9001
    x = rng.uniform(-4, 4, n).astype(np.float32)
    scale, zp = oracle.np_quant_params(x, qmin, qmax)
    q = ctx.quantize(x, scale, zp, qname)
    codes = oracle.np_unpack(q.view(np.uint8), n, bits, signed) if bits < 8 else q.astype(np.int64)
    want = oracle.np_dequant(codes, scale, zp)
    if reduce_op == "set":
        got = ctx.dequantize(q, n, scale, zp, qname)
        np.testing.assert_allclose(got, want, atol=1e-6)
    else:
        base = np.full(n, 2.5, np.float32)
        got = ctx.dequantize(q, n, scale, zp, qname, reduce_op="add", out=base.copy())
        np.testing.assert_allclose(got, base + want, atol=1e-5)
    # roundtrip bound
    assert np.abs(x - want).max() <= scale * 0.5 + 1e-5


def test_host_stochastic_and_requant(ctx):
    rng = np.random.default_rng(SEED + 2)
    n = 50_000
    x = rng.uniform(-2, 2, n).astype(np.float32)
    scale, zp = 0.01, 127
    qs = ctx.quantize(x, scale, zp, "uint8", "stochastic", seed=7).astype(np.int64)
    qn = ctx.quantize(x, scale, zp, "uint8", "nearest").astype(np.int64)
    assert np.abs(qs - qn).max() <= 1
    # unbiasedness on a constant
    c = np.full(200_000, 0.31337, np.float32)
    dq = ctx.dequantize(ctx.quantize(c, scale, zp, "uint8", "stochastic", seed=3),
                        c.size, scale, zp, "uint8")
    assert abs(dq.mean() - 0.31337) < 1e-4
    # fused requant == quant->dequant (nearest)
    rq = ctx.requantize(x, scale, zp, "uint4")
    q4 = ctx.quantize(x, scale, zp, "uint4")
    dq4 = ctx.dequantize(q4, n, scale, zp, "uint4")
    np.testing.assert_allclose(rq, dq4, atol=1e-6)


def test_host_params_and_minmax(ctx):
    rng = np.random.default_rng(SEED + 3)
    x = rng.normal(0, 3, 123_457).astype(np.float32)
    lo, hi = ctx.min_max(x)
    assert lo == x.min() and hi == x.max()
    scale, zp = ctx.compute_quant_params(x, "uint8")
    so, zo = oracle.np_quant_params(x, 0, 255)
    np.testing.assert_allclose(scale, so, rtol=1e-6)
    assert abs(zp - zo) <= 1
    # degenerate
    scale, zp = ctx.compute_quant_params(np.full(100, 5.0, np.float32), "uint8")
    assert scale == 1.0 and zp == 127


def test_host_bf16_roundtrip(ctx):
    import ml_dtypes

    rng = np.random.default_rng(SEED + 4)
    x = rng.uniform(-4, 4, 8192).astype(ml_dtypes.bfloat16)
    scale, zp = ctx.compute_quant_params(x, "uint8")
    q = ctx.quantize(x, scale, zp, "uint8")
    dq = ctx.dequantize(q, x.size, scale, zp, "uint8", out_dtype="bf16",
                        out=np.zeros(x.size, ml_dtypes.bfloat16))
    err = np.abs(x.astype(np.float32) - dq.view(ml_dtypes.bfloat16).astype(np.float32)).max()
    assert err <= scale * 0.5 + 0.02


def test_host_validation(ctx):
    with pytest.raises(ValueError):
        ctx.dequantize(np.zeros(10, np.uint8), 100, 1.0, 0, "uint4")
    with pytest.raises(ValueError):
        ctx.dequantize(np.zeros(10, np.uint8), 20, 1.0, 0, "uint4", reduce_op="add")


def test_reference_c_abi_compat(tmp_path):
    """A C program written against the reference header's symbols
    (include/piquant.h:42-85) must link against libpiquant_host.so and pass
    a quantize/dequantize/params roundtrip (csrc/piquant_compat.cpp)."""
    import shutil
    import subprocess

    from piquant_tpu.runtime.host import _CSRC

    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler")
    exe = tmp_path / "compat_check"
    subprocess.run(
        [cc, "-O2", "-o", str(exe), f"{_CSRC}/compat_check.c",
         f"-L{_CSRC}", "-lpiquant_host", "-lm", f"-Wl,-rpath,{_CSRC}"],
        check=True, capture_output=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True)
    assert out.returncode == 0, (out.returncode, out.stdout, out.stderr)
    assert "compat ok" in out.stdout


def test_reference_c_abi_ctypes_stochastic():
    """Stochastic mode through the reference ABI is unbiased-ish and
    decorrelated across calls (context-held seed counter)."""
    import ctypes

    from piquant_tpu.runtime.host import _find_lib, _load

    # _load() builds the library if absent; CDLL(None) would otherwise
    # load the main process and fail with a confusing missing symbol
    if _load() is None:
        pytest.skip("native host library unavailable")
    lib = ctypes.CDLL(_find_lib())
    lib.piquant_context_create.restype = ctypes.c_void_p
    lib.piquant_context_create.argtypes = [ctypes.c_size_t]
    lib.piquant_quantize.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_size_t, ctypes.c_float, ctypes.c_int64,
        ctypes.c_int32]
    lib.piquant_context_destroy.argtypes = [ctypes.c_void_p]
    ctx = lib.piquant_context_create(2)
    n = 65536
    x = np.full(n, 0.5, np.float32)  # exactly between codes at scale 1.0
    outs = []
    for _ in range(2):
        q = np.zeros(n, np.uint8)
        lib.piquant_quantize(ctx, x.ctypes.data_as(ctypes.c_void_p), 0,
                             q.ctypes.data_as(ctypes.c_void_p), 4, n,
                             1.0, 0, 1)  # REF_UINT8=4, stochastic=1
        outs.append(q.copy())
    lib.piquant_context_destroy(ctx)
    for q in outs:
        frac = q.mean()
        assert 0.45 < frac < 0.55, frac  # ~half round up
    assert not np.array_equal(outs[0], outs[1])  # per-call seeds differ


def test_host_nf4_roundtrip_matches_python_codebook():
    """csrc NF4 vs the Python codebook (quant/linear.py): identical codes
    (exact nearest-neighbour) and identical dequantized values."""
    import numpy as np

    from piquant_tpu.quant.linear import (NF4_CODEBOOK, codebook_decode,
                                          codebook_encode)
    from piquant_tpu.runtime.host import HostContext, host_available

    if not host_available():
        import pytest as _p
        _p.skip("native host runtime unavailable")
    import jax.numpy as jnp

    ctx = HostContext(num_threads=3)
    rng = np.random.default_rng(0x4E5)
    for n in (64, 257):  # even and odd numel (zeroed tail nibble)
        x = rng.normal(0, 0.5, n).astype(np.float32)
        packed, scale = ctx.quantize_nf4(x)
        assert packed.size == (n + 1) // 2 and scale > 0
        want_codes = np.asarray(codebook_encode(
            jnp.asarray(x / scale), "nf4"), np.uint8)
        got_codes = np.zeros(n, np.uint8)
        got_codes[0::2] = packed[: (n + 1) // 2] & 0xF
        got_codes[1::2] = (packed[: n // 2] >> 4) & 0xF
        np.testing.assert_array_equal(got_codes, want_codes)
        dq = ctx.dequantize_nf4(packed, n, scale)
        want = np.asarray(codebook_decode(jnp.asarray(want_codes.astype(
            np.int32)), "nf4")) * scale
        np.testing.assert_allclose(dq, want, rtol=1e-6)
        # ADD accumulates
        acc = np.ones(n, np.float32)
        ctx.dequantize_nf4(packed, n, scale, reduce_op="add", out=acc)
        np.testing.assert_allclose(acc, want + 1.0, rtol=1e-6)
    # bf16 input path
    import ml_dtypes
    xb = rng.normal(0, 0.5, 128).astype(ml_dtypes.bfloat16)
    packed, scale = ctx.quantize_nf4(xb)
    dq = ctx.dequantize_nf4(packed, 128, scale)
    assert np.abs(dq - xb.astype(np.float32)).max() <= scale * 0.16
