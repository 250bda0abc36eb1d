"""NF4 (NormalFloat-4, QLoRA arXiv:2305.14314) weight-only quantization.

Covers the codebook contract (bitsandbytes-compatible table, exact
nearest-neighbour encode), the quality claim (beats affine INT4 on
normally-distributed weights at the same granularity), the matmul paths
(XLA LUT fallback + Pallas LUT kernel in interpret mode), model-level
plumbing (quantize_params / fusion / MoE stacks / weight cache / QLoRA),
and the no-wire-ABI contract (reference include/piquant.h has no
non-uniform dtype)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

# hardware bf16 LUT decode + dot accumulation differ from interpret's
# f32 emulation (NOTES r3: up to 0.042 abs at k=2048) — widen ON-CHIP only
_MM_TOL = (dict(atol=1e-2, rtol=5e-2)
           if os.environ.get("PIQUANT_TPU_TEST_TPU") == "1"
           else dict(atol=1e-3, rtol=1e-3))

from piquant_tpu.quant.linear import (
    NF4_CODEBOOK, QuantizedExpertStack, codebook_decode, codebook_encode,
    quantize_linear_weight, quantized_matmul, unpack_split_half,
    _matmul_nf4_jnp)

def _kmode():
    """Compiled on-chip (PIQUANT_TPU_TEST_TPU=1), interpret elsewhere —
    forcing interpret mode against the remote TPU backend deadlocks
    (see test_qmatmul.py)."""
    import contextlib
    import os
    if os.environ.get("PIQUANT_TPU_TEST_TPU") == "1":
        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


SEED = 0x4E5434


def _w(k, n, std=1.0, seed=SEED):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, std, (k, n)), jnp.float32)


def test_codebook_contract():
    lut = np.asarray(NF4_CODEBOOK)
    assert lut.shape == (16,)
    assert lut[0] == -1.0 and lut[15] == 1.0 and lut[7] == 0.0
    assert np.all(np.diff(lut) > 0)  # strictly sorted
    # encode is exact nearest-neighbour: the codebook's own values map to
    # their indices, and midpoints split to a neighbour
    codes = codebook_encode(jnp.asarray(lut, jnp.float32), "nf4")
    np.testing.assert_array_equal(np.asarray(codes), np.arange(16))
    vals = codebook_decode(codes.reshape(4, 4), "nf4")
    np.testing.assert_allclose(np.asarray(vals).reshape(-1), lut, rtol=1e-6)


def test_encode_is_nearest_neighbour_vs_argmin():
    rng = np.random.default_rng(SEED)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    got = np.asarray(codebook_encode(jnp.asarray(x), "nf4"))
    lut = np.asarray(NF4_CODEBOOK)
    want = np.abs(x[:, None] - lut[None, :]).argmin(axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("group_size", [None, 32, 64])
def test_roundtrip_and_storage(group_size):
    k, n = 256, 128
    w = _w(k, n, std=0.05)
    ql = quantize_linear_weight(w, "nf4", group_size=group_size)
    assert ql.codebook == "nf4" and ql.bits == 4
    assert ql.data.shape == (k // 2, n)          # split-half packed
    assert ql.s_chunk is None and ql.z_chunk is None
    assert int(jnp.max(jnp.abs(ql.zero_point))) == 0
    dq = np.asarray(ql.dequantize(jnp.float32))
    # absmax scaling: every dequantized value within its group's absmax,
    # and the roundtrip error bounded by half the widest codebook gap
    lut = np.asarray(NF4_CODEBOOK)
    widest = np.max(np.diff(lut)) / 2
    s, _ = ql._expanded_params()
    err = np.abs(dq - np.asarray(w))
    assert np.all(err <= np.asarray(s) * widest + 1e-6)


def test_nf4_beats_affine_int4_on_gaussian():
    """The QLoRA claim, measured honestly: asymmetric min/max affine INT4
    adapts per group and matches NF4 at the SAME fine group size, but NF4
    wins (a) at coarse granularity (channelwise: absmax quantiles beat a
    grid stretched by the min/max asymmetry) and (b) at EQUAL metadata
    bytes — NF4 stores scale only (4 B/group) vs affine's scale+zp
    (8 B/group), so nf4-g32 compares against int4-g64 (measured on this
    seed: 1.74e-3 vs 1.81e-3 RMS; channelwise 2.08e-3 vs 2.49e-3)."""
    w = _w(1024, 256, std=0.02)

    def rms(bits, gs):
        ql = quantize_linear_weight(w, bits, group_size=gs)
        dq = np.asarray(ql.dequantize(jnp.float32))
        return float(np.sqrt(np.mean((dq - np.asarray(w)) ** 2)))

    assert rms("nf4", None) < rms(4, None)     # coarse granularity
    assert rms("nf4", 32) < rms(4, 64)         # equal metadata bytes


@pytest.mark.parametrize("group_size", [None, 64])
@pytest.mark.parametrize("m", [1, 7])
def test_matmul_fallback_matches_dequantized(group_size, m):
    k, n = 256, 128
    w = _w(k, n, std=0.05, seed=SEED + 1)
    ql = quantize_linear_weight(w, "nf4", group_size=group_size)
    x = _w(m, k, seed=SEED + 2)
    got = np.asarray(quantized_matmul(x, ql, jnp.float32))
    want = np.asarray(x) @ np.asarray(ql.dequantize(jnp.float32))
    np.testing.assert_allclose(got, want, **_MM_TOL)


def test_matmul_straddling_groups_general_path():
    # (K/2) % gs != 0: groups straddle the split-half plane boundary ->
    # the general concat path, still exact vs the dequantized product
    k, n, gs = 384, 128, 128   # kh=192, 192 % 128 != 0
    w = _w(k, n, std=0.05, seed=SEED + 3)
    ql = quantize_linear_weight(w, "nf4", group_size=gs)
    x = _w(3, k, seed=SEED + 4)
    got = np.asarray(_matmul_nf4_jnp(x, ql, jnp.float32))
    want = np.asarray(x) @ np.asarray(ql.dequantize(jnp.float32))
    np.testing.assert_allclose(got, want, **_MM_TOL)


@pytest.mark.parametrize("group_size", [None, 64])
@pytest.mark.parametrize("m", [1, 8, 33])
def test_pallas_lut_kernel_interpret(group_size, m):
    from piquant_tpu.ops.pallas import qmatmul as Q

    k, n = 256, 512
    w = _w(k, n, std=0.05, seed=SEED + 5)
    ql = quantize_linear_weight(w, "nf4", group_size=group_size)
    x = _w(m, k, seed=SEED + 6)
    # reference FIRST, and force each interpret-mode result to host before
    # dispatching more work: a new eager dispatch while the interpreter's
    # io_callback threads are mid-barrier deadlocks on the virtual mesh
    want = np.asarray(_matmul_nf4_jnp(x, ql, jnp.float32))
    with _kmode():
        got = Q.nf4_matmul(x, ql, jnp.float32)
        assert got is not None
        got = np.asarray(got)
        # the pallas dispatcher routes codebook weights to the LUT kernel
        via_dispatch = np.asarray(Q.quantized_matmul(x, ql, jnp.float32))
    # bf16 value planes in the kernel: ~0.4% rel tolerance
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(via_dispatch), want,
                               atol=2e-2, rtol=1e-2)


def test_no_wire_abi():
    ql = quantize_linear_weight(_w(64, 32), "nf4")
    with pytest.raises(ValueError, match="wire ABI"):
        ql.to_wire()


def test_expert_stack_propagates_codebook():
    qls = [quantize_linear_weight(_w(64, 32, seed=SEED + e), "nf4",
                                  group_size=32) for e in range(3)]
    st = QuantizedExpertStack.stack(qls)
    assert st.codebook == "nf4"
    e1 = st.expert(1)
    assert e1.codebook == "nf4"
    np.testing.assert_allclose(np.asarray(e1.dequantize(jnp.float32)),
                               np.asarray(qls[1].dequantize(jnp.float32)))
    # mixing affine and codebook experts must be rejected
    with pytest.raises(ValueError, match="geometry"):
        QuantizedExpertStack.stack([qls[0], quantize_linear_weight(
            _w(64, 32), 4, group_size=32)])


def test_model_quantize_params_nf4():
    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=64, d_model=64, n_layers=2, n_heads=2,
                        n_kv_heads=1, d_ff=128, max_seq_len=64,
                        dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(0))
    toks = jnp.asarray(np.random.default_rng(SEED).integers(0, 64, (2, 16)),
                       jnp.int32)
    base, _ = M.forward(cfg, params, toks)
    qp = M.quantize_params(params, bits="nf4", group_size=32)
    assert qp["layers"][0]["wq"].codebook == "nf4"
    logits, _ = M.forward(cfg, qp, toks)
    assert np.isfinite(np.asarray(logits)).all()
    # nf4 quantization error stays small on an untrained tiny model
    assert float(jnp.max(jnp.abs(logits - base))) < 1.0
    # mixed override: attention nf4, MLP int4-g32
    qp2 = M.quantize_params(params, bits="nf4", group_size=32,
                            overrides={"w1": (4, 32), "w3": (4, 32),
                                       "w2": (4, 32)})
    assert qp2["layers"][0]["w1"].codebook is None
    logits2, _ = M.forward(cfg, qp2, toks)
    assert np.isfinite(np.asarray(logits2)).all()
    # projection fusion keeps the codebook
    fused = M.fuse_layer_projections(qp, cfg)
    assert fused["layers"][0]["wqkv"].codebook == "nf4"
    logits3, _ = M.forward(cfg, fused, toks)
    np.testing.assert_allclose(np.asarray(logits3), np.asarray(logits),
                               atol=1e-4, rtol=1e-4)


def test_weight_cache_roundtrip_nf4(tmp_path):
    from piquant_tpu.utils.weight_cache import load_quantized, save_quantized

    ql = quantize_linear_weight(_w(128, 64, std=0.05), "nf4", group_size=32)
    save_quantized(str(tmp_path / "c"), {"w": ql})
    back = load_quantized(str(tmp_path / "c"))["w"]
    assert back.codebook == "nf4" and back.s_chunk is None
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(ql.data))
    np.testing.assert_allclose(np.asarray(back.dequantize(jnp.float32)),
                               np.asarray(ql.dequantize(jnp.float32)))


def test_qlora_merge_requantizes_to_nf4():
    from piquant_tpu.quant.lora import add_lora, merge_lora

    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig(vocab_size=64, d_model=64, n_layers=1, n_heads=2,
                        n_kv_heads=1, d_ff=128, max_seq_len=64,
                        dtype=jnp.float32)
    qp = M.quantize_params(M.init_params(cfg, jax.random.key(0)),
                           bits="nf4", group_size=32)
    lp = add_lora(qp, rank=4, key=jax.random.key(1))
    merged = merge_lora(lp)
    assert merged["layers"][0]["wq"].codebook == "nf4"


def test_gptq_rejects_nf4():
    from piquant_tpu.quant.gptq import gptq_quantize_params

    with pytest.raises(ValueError, match="affine"):
        gptq_quantize_params(None, None, None, "nf4")
