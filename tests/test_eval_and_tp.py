"""Perplexity harness + tensor-parallel model execution on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding

from piquant_tpu.eval import perplexity
from piquant_tpu.models import llama as M
from piquant_tpu.parallel import make_mesh

SEED = 0x9032002


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny()
    params = M.init_params(cfg, jax.random.key(SEED))
    return cfg, params


def test_perplexity_quantized_delta(setup):
    cfg, params = setup
    rng = np.random.default_rng(SEED)
    toks = list(map(int, rng.integers(0, cfg.vocab_size, 300)))
    ppl_f = perplexity(cfg, params, toks, window=64, stride=32)
    ppl_q8 = perplexity(cfg, M.quantize_params(params, 8), toks, window=64, stride=32)
    ppl_q4 = perplexity(cfg, M.quantize_params(params, 4), toks, window=64, stride=32)
    assert ppl_f > 1.0
    # int8 within 0.1 ppl even on the random tiny model; int4 close
    assert abs(ppl_q8 - ppl_f) < 0.1 * ppl_f / 10 + 0.5, (ppl_q8, ppl_f)
    assert abs(ppl_q4 - ppl_f) / ppl_f < 0.05, (ppl_q4, ppl_f)


def test_perplexity_validates_input(setup):
    cfg, params = setup
    with pytest.raises(ValueError):
        perplexity(cfg, params, [1])


def test_tp_sharded_forward_matches_unsharded(setup):
    cfg, params = setup
    qparams = M.quantize_params(params, bits=4)
    mesh = make_mesh([("tp", -1)])
    sharded = M.shard_params(qparams, mesh, "tp")

    tokens = jnp.asarray([[1, 5, 9, 13, 2, 8, 7, 3]], jnp.int32)
    want, _ = M.forward(cfg, qparams, tokens)

    @jax.jit
    def fwd(p, t):
        logits, _ = M.forward(cfg, p, t)
        return logits

    got = fwd(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_tp_sharded_decode_with_cache(setup):
    cfg, params = setup
    qparams = M.quantize_params(params, bits=4)
    mesh = make_mesh([("tp", 4)], devices=jax.devices()[:4])
    sharded = M.shard_params(qparams, mesh, "tp")

    cache = M.init_kv_cache(cfg, 2, max_len=16)
    step = jax.jit(lambda p, t, pos, c: M.decode_step(cfg, p, t, pos, c))
    tok = jnp.asarray([1, 2], jnp.int32)
    for i in range(3):
        logits, cache = step(sharded, tok, jnp.full((2,), i, jnp.int32), cache)
        tok = logits.argmax(-1).astype(jnp.int32)
    assert logits.shape == (2, cfg.vocab_size)


def test_tp_sharded_groupwise_forward(setup):
    """shard_params must preserve group_size on QuantizedLinear leaves
    (regression: it was dropped, breaking TP of group-wise models)."""
    cfg, params = setup
    qparams = M.quantize_params(params, bits=4, group_size=32)
    mesh = make_mesh([("tp", -1)])
    sharded = M.shard_params(qparams, mesh, "tp")
    assert sharded["layers"][0]["wq"].group_size == 32

    tokens = jnp.asarray([[1, 5, 9, 13, 2, 8, 7, 3]], jnp.int32)
    want, _ = M.forward(cfg, qparams, tokens)

    @jax.jit
    def fwd(p, t):
        logits, _ = M.forward(cfg, p, t)
        return logits

    got = fwd(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_tp_sharded_engine_serving(setup):
    """The continuous-batching Engine serves TP-sharded params end-to-end
    (GSPMD propagates the shardings through every jitted engine program);
    tokens match the unsharded engine exactly."""
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg, params = setup
    qparams = M.quantize_params(params, bits=4)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    def run(p):
        eng = Engine(cfg, p, EngineConfig(batch_slots=2, max_seq_len=64,
                                          decode_block=4))
        for i, pr in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=list(pr),
                               sampling=SamplingParams(max_new_tokens=6)))
        return {r.rid: r.tokens for r in eng.run()}

    want = run(qparams)
    mesh = make_mesh([("tp", 4)], devices=jax.devices()[:4])
    got = run(M.shard_params(qparams, mesh, "tp"))
    assert got == want, (got, want)
