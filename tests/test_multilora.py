"""Multi-tenant LoRA serving (quant/lora.MultiLoraLinear + engine
adapter_id): N adapters over one shared packed base, selected per batch
row.  Contracts: per-row selection equals the single-adapter forward,
the null adapter equals the bare base, and the engine serves mixed
adapters in one batch with tokens identical to per-adapter engines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant.lora import (LoraLinear, add_lora, n_adapters,
                                    set_adapter_ids, stack_adapters,
                                    with_lora)
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

SEED = 0x510


def _mk_sets(base, seed_base):
    # two "trained" adapters: random non-zero B so deltas actually differ
    sets = []
    for i in range(2):
        lp = add_lora(base, rank=4, key=jax.random.key(seed_base + i))
        ad = {li: {k: (a, jax.random.normal(
            jax.random.fold_in(jax.random.key(seed_base + 100 + i), li),
            b.shape, jnp.float32) * 0.05)
            for k, (a, b) in sub.items()}
            for li, sub in __import__(
                "piquant_tpu.quant.lora", fromlist=["lora_params"]
            ).lora_params(lp).items()}
        sets.append(with_lora(lp, ad))
    multi = stack_adapters(base, sets)  # 0 = null, 1..2 = adapters
    return sets, multi


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny(vocab=64)
    base = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)), bits=4)
    sets, multi = _mk_sets(base, 100)
    return cfg, base, sets, multi


from tests.token_guard import assert_tokens_match_guarded


def _assert_tokens_match_guarded(cfg, params, prompt, got, want, tag=""):
    assert_tokens_match_guarded(
        lambda tt: M.forward(cfg, params, tt)[0], prompt, got, want, tag)


def test_per_row_selection_matches_single(setup):
    cfg, base, sets, multi = setup
    assert n_adapters(multi) == 3
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (3, 10)),
                       jnp.int32)
    # rows select (null, adapter1, adapter2)
    p = set_adapter_ids(multi, [0, 1, 2])
    got, _ = M.forward(cfg, p, toks)
    got = np.asarray(got)
    want0, _ = M.forward(cfg, base, toks[:1])
    want1, _ = M.forward(cfg, sets[0], toks[1:2])
    want2, _ = M.forward(cfg, sets[1], toks[2:3])
    np.testing.assert_allclose(got[0], np.asarray(want0)[0], atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(got[1], np.asarray(want1)[0], atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(got[2], np.asarray(want2)[0], atol=1e-4,
                               rtol=1e-4)
    # the two adapters genuinely differ
    assert np.abs(got[1] - got[2]).max() > 1e-3


def _run_engine(cfg, params, reqs, **ec_kw):
    eng = Engine(cfg, params, EngineConfig(batch_slots=4, max_seq_len=128,
                                           decode_block=4, **ec_kw))
    for r in reqs:
        eng.submit(r)
    eng.run()
    return eng


def test_engine_mixed_adapters_match_single_adapter_runs(setup):
    cfg, base, sets, multi = setup
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=12)

    # reference: each request through a single-adapter (or base) engine
    want = []
    for i, pr in enumerate(prompts):
        aid = i % 3
        ref_params = base if aid == 0 else sets[aid - 1]
        r = Request(rid=0, prompt=list(pr), sampling=sp)
        _run_engine(cfg, ref_params, [r])
        want.append(list(r.tokens))

    reqs = [Request(rid=i, prompt=list(pr), sampling=sp, adapter_id=i % 3)
            for i, pr in enumerate(prompts)]
    _run_engine(cfg, multi, reqs)
    for i, r in enumerate(reqs):
        ref_params = base if i % 3 == 0 else sets[i % 3 - 1]
        _assert_tokens_match_guarded(cfg, ref_params, prompts[i],
                                     r.tokens, want[i], tag=f"req {i}")


def test_engine_chunked_prefill_with_adapters(setup):
    # both sides run the CHUNKED path so only adapter selection differs
    # (chunked-vs-one-shot numeric parity is test_serving's concern; on a
    # random-weight model a near-tie argmax can flip between the paths)
    cfg, base, sets, multi = setup
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    prompt = list(range(1, 20))
    r_ref = Request(rid=0, prompt=list(prompt), sampling=sp)
    _run_engine(cfg, sets[1], [r_ref], prefill_chunk=8)

    r = Request(rid=1, prompt=list(prompt), sampling=sp, adapter_id=2)
    _run_engine(cfg, multi, [r], prefill_chunk=8)
    _assert_tokens_match_guarded(cfg, sets[1], prompt, r.tokens,
                                 r_ref.tokens, tag="chunked")


def test_engine_validates_adapter_ids(setup):
    cfg, base, sets, multi = setup
    eng = Engine(cfg, multi, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="outside"):
        eng.submit(Request(rid=0, prompt=[1], adapter_id=7))
    eng2 = Engine(cfg, base, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="MultiLoraLinear"):
        eng2.submit(Request(rid=1, prompt=[1], adapter_id=1))


def test_fuse_rejects_multilora(setup):
    cfg, base, sets, multi = setup
    with pytest.raises(ValueError, match="merge_lora"):
        M.fuse_layer_projections(multi, cfg)


def test_rank_mismatch_rejected(setup):
    cfg, base, sets, multi = setup
    other = add_lora(base, rank=8, key=jax.random.key(9))
    with pytest.raises(ValueError, match="rank"):
        stack_adapters(base, [sets[0], other])


def test_mla_multilora_per_row_selection():
    """Multi-tenant LoRA over the MLA projections (mla._mm): per-row
    selection equals the single-adapter forward; kv_a/kv_b stay bare
    (absorbed decode would silently drop their deltas — MLA_LORA_KEYS)."""
    from piquant_tpu.models import mla as L
    from piquant_tpu.quant.lora import MLA_LORA_KEYS, lora_params

    cfg = L.MLAConfig.tiny(vocab=64, dtype=jnp.float32)
    # float base: the INT8 latent-cache scales make quantized-MLA outputs
    # batch-shape-sensitive at the 5e-3 level (shared per-position scales),
    # which would mask the per-row adapter property under test
    base = L.init_params(cfg, jax.random.key(77))
    lp = add_lora(base, rank=4, key=jax.random.key(78), keys=MLA_LORA_KEYS)
    ad = {li: {k: (a, jax.random.normal(
        jax.random.fold_in(jax.random.key(79), li), b.shape,
        jnp.float32) * 0.05) for k, (a, b) in sub.items()}
        for li, sub in lora_params(lp).items()}
    single = with_lora(lp, ad)
    multi = stack_adapters(base, [single], keys=MLA_LORA_KEYS)
    assert n_adapters(multi) == 2
    assert not hasattr(multi["layers"][0].get("kv_b"), "ids")  # excluded

    toks = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 9)),
                       jnp.int32)
    p = set_adapter_ids(multi, [0, 1])
    got, _ = L.forward(cfg, p, toks)
    got = np.asarray(got)
    w0, _ = L.forward(cfg, base, toks[:1])
    w1, _ = L.forward(cfg, single, toks[1:2])
    np.testing.assert_allclose(got[0], np.asarray(w0)[0], atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(got[1], np.asarray(w1)[0], atol=1e-4,
                               rtol=1e-4)

    # and through the engine (MLA decode path + absorbed attention)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    ra = Request(rid=0, prompt=[1, 2, 3], sampling=sp, adapter_id=1)
    rb = Request(rid=1, prompt=[1, 2, 3], sampling=sp, adapter_id=0)
    eng = Engine(cfg, multi, EngineConfig(batch_slots=2, max_seq_len=64,
                                          decode_block=2))
    eng.submit(ra); eng.submit(rb); eng.run()
    r_ref = Request(rid=2, prompt=[1, 2, 3], sampling=sp)
    eng0 = Engine(cfg, base, EngineConfig(batch_slots=2, max_seq_len=64,
                                          decode_block=2))
    eng0.submit(r_ref); eng0.run()
    assert rb.tokens == r_ref.tokens
    eng1 = Engine(cfg, single, EngineConfig(batch_slots=2, max_seq_len=64,
                                            decode_block=2))
    r1 = Request(rid=3, prompt=[1, 2, 3], sampling=sp)
    eng1.submit(r1); eng1.run()
    assert ra.tokens == r1.tokens
