"""Torch adapter tests — cross-validation against torch.quantize_per_tensor as
a second oracle, mirroring the reference's python test strategy
(python/tests/test_torch.py:23-53)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import piquant_tpu.interop.torch as pq_torch

SEED = 0x9032002


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(SEED)


def test_params_sanity():
    t = torch.rand(64, 128) * 4 - 2
    scale, zp = pq_torch.compute_quant_params(t, dtype=torch.quint8)
    assert scale > 0 and 0 <= zp <= 255


@pytest.mark.parametrize("shape", [(1000,), (17, 33), (4, 5, 6, 7)])
def test_quantize_matches_torch_oracle(shape):
    t = torch.rand(*shape) * 6 - 3
    scale, zp = pq_torch.compute_quant_params(t, dtype=torch.quint8)
    ours = pq_torch.quantize(t, scale=scale, zero_point=zp, dtype=torch.quint8)
    theirs = torch.quantize_per_tensor(t, scale, zp, torch.quint8)
    dq_ours = pq_torch.dequantize(ours, scale=scale, zero_point=zp, dtype=torch.float32)
    dq_theirs = theirs.dequantize()
    # both dequantized results agree and satisfy the roundtrip bound
    assert torch.allclose(dq_ours, dq_theirs, atol=1e-3)
    atol = scale * 0.5 + 1e-3
    assert (dq_ours - t).abs().max() <= atol


@pytest.mark.parametrize("dtype", [torch.quint4x2, torch.quint2x4])
def test_subbyte_packed_layout(dtype):
    # packed torch tensors share the wire ABI: compare raw bytes with the
    # reference layout computed by hand
    t = torch.tensor([0.0, 1.0, 2.0, 3.0, 0.0, 1.0, 2.0, 3.0])
    q = pq_torch.quantize(t, scale=1.0, zero_point=0, dtype=dtype)
    import ctypes

    n = 4 if dtype == torch.quint4x2 else 2
    raw = np.empty(n, np.uint8)
    ctypes.memmove(raw.ctypes.data, q.data_ptr(), n)
    if dtype == torch.quint4x2:
        assert raw.tolist() == [0x10, 0x32, 0x10, 0x32]
    else:
        assert raw.tolist() == [0b11100100, 0b11100100]


def test_bf16_roundtrip():
    t = (torch.rand(4096) * 4 - 2).to(torch.bfloat16)
    scale, zp = pq_torch.compute_quant_params(t, dtype=torch.quint8)
    q = pq_torch.quantize(t, scale=scale, zero_point=zp, dtype=torch.quint8)
    dq = pq_torch.dequantize(q, scale=scale, zero_point=zp, dtype=torch.bfloat16)
    err = (dq.float() - t.float()).abs().max().item()
    assert err <= scale * 0.5 + 0.02


def test_dequantize_add_accumulates():
    t = torch.rand(1000)
    scale, zp = pq_torch.compute_quant_params(t, dtype=torch.quint8)
    q = pq_torch.quantize(t, scale=scale, zero_point=zp, dtype=torch.quint8)
    base = torch.full((1000,), 5.0)
    acc = pq_torch.dequantize(q, scale=scale, zero_point=zp, dtype=torch.float32,
                              reduce_op="add", out=base)
    setv = pq_torch.dequantize(q, scale=scale, zero_point=zp, dtype=torch.float32)
    assert torch.allclose(acc, setv + 5.0, atol=1e-5)


def test_stochastic_mode():
    t = torch.rand(10_000)
    q = pq_torch.quantize(t, scale=0.01, zero_point=0, dtype=torch.quint8,
                          round_mode="stochastic", seed=3)
    qn = pq_torch.quantize(t, scale=0.01, zero_point=0, dtype=torch.quint8)
    import ctypes

    a = np.empty(10_000, np.uint8)
    b = np.empty(10_000, np.uint8)
    ctypes.memmove(a.ctypes.data, q.data_ptr(), 10_000)
    ctypes.memmove(b.ctypes.data, qn.data_ptr(), 10_000)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_validation():
    with pytest.raises(ValueError):
        pq_torch.quantize(torch.zeros(4, dtype=torch.int32), scale=1.0,
                          zero_point=0, dtype=torch.quint8)
    with pytest.raises(ValueError):
        pq_torch.dequantize(torch.zeros(4), scale=1.0, zero_point=0,
                            dtype=torch.float32)


def test_quantize_rejects_oversized_payload(monkeypatch):
    """An oversized packed payload must raise, not memmove past the torch
    buffer (regression: the nbytes-fit check was a dead assert, ADVICE r1)."""
    class _FakeCtx:
        def quantize(self, x, scale, zp, qname, round_mode, seed=0):
            return np.zeros(x.size * 2, dtype=np.uint8)  # 2x too big

    monkeypatch.setattr(pq_torch, "_host_ctx", lambda: _FakeCtx())
    with pytest.raises(ValueError, match="exceeds"):
        pq_torch.quantize(torch.zeros(8), scale=1.0, zero_point=0,
                          dtype=torch.quint8)
