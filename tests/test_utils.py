"""Weight-cache roundtrip + profiling harness smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from piquant_tpu.models import llama as M
from piquant_tpu.utils import load_quantized, measure_throughput, save_quantized

SEED = 0x9032002


def test_weight_cache_roundtrip(tmp_path):
    cfg = M.LlamaConfig.tiny()
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)), bits=4)
    save_quantized(str(tmp_path / "w"), params)
    loaded = load_quantized(str(tmp_path / "w"))

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    l1, _ = M.forward(cfg, params, tokens)
    l2, _ = M.forward(cfg, loaded, tokens)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_weight_cache_version_check(tmp_path):
    import json
    import pytest

    cfg = M.LlamaConfig.tiny()
    params = {"embed": jnp.ones((4, 4))}
    save_quantized(str(tmp_path / "w"), params)
    man = tmp_path / "w" / "manifest.json"
    j = json.loads(man.read_text())
    j["format_version"] = 999
    man.write_text(json.dumps(j))
    with pytest.raises(ValueError):
        load_quantized(str(tmp_path / "w"))


def test_measure_throughput_smoke():
    x = jnp.ones((1024, 128), jnp.float32)
    rep = measure_throughput(lambda c: c * 1.000001, x,
                             bytes_per_iter=x.size * 8, k1=2, k2=6, reps=2)
    assert rep["s_per_iter"] >= 0 or rep["gb_per_s"] > 0


def test_weight_cache_group_size_and_experts(tmp_path):
    """group_size must survive the cache roundtrip (it parameterizes
    dequantization); expert stacks persist as first-class nodes."""
    import jax
    import jax.numpy as jnp

    from piquant_tpu.models import llama as M
    from piquant_tpu.quant.linear import (QuantizedExpertStack,
                                          quantize_linear_weight)

    w = jax.random.normal(jax.random.key(0), (64, 32), jnp.float32) * 0.05
    ql = quantize_linear_weight(w, 4, group_size=16)
    cfg = M.LlamaConfig.tiny(n_experts=2, moe_top_k=1, dtype=jnp.float32)
    qp = M.quantize_params(M.init_params(cfg, jax.random.key(1)), bits=8)
    tree = {"grouped": ql, "experts": qp["layers"][0]["moe_w1"]}

    save_quantized(str(tmp_path / "w"), tree)
    loaded = load_quantized(str(tmp_path / "w"))

    assert loaded["grouped"].group_size == 16
    np.testing.assert_array_equal(np.asarray(loaded["grouped"].dequantize()),
                                  np.asarray(ql.dequantize()))
    st = loaded["experts"]
    assert isinstance(st, QuantizedExpertStack) and st.n_experts == 2
    np.testing.assert_array_equal(np.asarray(st.data),
                                  np.asarray(qp["layers"][0]["moe_w1"].data))


def test_safetensors_roundtrip_quantized_model():
    """save_safetensors/load_safetensors: one-file HF-ecosystem container
    for packed params — bit-exact roundtrip incl. NF4 codebook leaves,
    bf16 fixup, expert stacks, and rebuilt grouped side streams."""
    import tempfile, os
    import numpy as np
    import jax
    import jax.numpy as jnp

    from piquant_tpu.models import llama as M
    from piquant_tpu.utils.safetensors_io import (load_safetensors,
                                                  save_safetensors)

    cfg = M.LlamaConfig.tiny(vocab=64, n_experts=2, moe_top_k=1,
                             dtype=jnp.bfloat16)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(3)),
                               bits=4, group_size=32,
                               overrides={"wq": ("nf4", 32)})
    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "m.safetensors")
        save_safetensors(fp, params)
        back = load_safetensors(fp)
    for li, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            b = back["layers"][li][k]
            if hasattr(v, "data"):
                np.testing.assert_array_equal(np.asarray(v.data),
                                              np.asarray(b.data))
                np.testing.assert_array_equal(np.asarray(v.scale),
                                              np.asarray(b.scale))
                assert (v.bits, v.k, v.group_size, v.codebook) == (
                    b.bits, b.k, b.group_size, b.codebook)
                if v.s_chunk is not None:
                    np.testing.assert_array_equal(np.asarray(v.s_chunk),
                                                  np.asarray(b.s_chunk))
            else:
                assert b.dtype == v.dtype
                np.testing.assert_array_equal(np.asarray(b), np.asarray(v))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)),
                       jnp.int32)
    la, _ = M.forward(cfg, params, toks)
    lb, _ = M.forward(cfg, back, toks)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_safetensors_rejects_foreign_file():
    import tempfile, os
    import numpy as np
    import pytest as _pytest

    from piquant_tpu.utils.safetensors_io import load_safetensors
    from safetensors.numpy import save_file

    with tempfile.TemporaryDirectory() as td:
        fp = os.path.join(td, "x.safetensors")
        save_file({"w": np.zeros((2, 2), np.float32)}, fp)
        with _pytest.raises(ValueError, match="piquant_format"):
            load_safetensors(fp)
