"""OpenAI-style sampling penalties: frequency/presence (generated-token
counts) and logit_bias, applied inside the jitted decode block
(sampler.apply_freq_presence + engine track_history wiring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams
from piquant_tpu.serving.sampler import apply_freq_presence

SEED = 0x0A1


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny(vocab=64)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)),
                               bits=4)
    return cfg, params


def test_apply_freq_presence_matches_numpy_oracle():
    rng = np.random.default_rng(SEED)
    b, v, s = 3, 32, 16
    logits = rng.normal(size=(b, v)).astype(np.float32)
    hist = rng.integers(0, v, (b, s)).astype(np.int32)
    start = np.asarray([4, 0, 16], np.int32)   # prompt lengths
    hlen = np.asarray([10, 16, 16], np.int32)
    fp = np.asarray([0.5, 0.0, 2.0], np.float32)
    pp = np.asarray([0.25, 1.0, 0.0], np.float32)
    got = np.asarray(apply_freq_presence(
        jnp.asarray(logits), jnp.asarray(hist), jnp.asarray(start),
        jnp.asarray(hlen), jnp.asarray(fp), jnp.asarray(pp)))
    want = logits.copy()
    for i in range(b):
        counts = np.zeros(v)
        for j in range(start[i], hlen[i]):
            counts[hist[i, j]] += 1
        want[i] -= fp[i] * counts + pp[i] * (counts > 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_frequency_penalty_forbids_repeats(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=128,
                                           decode_block=4,
                                           track_history=True))
    r = Request(rid=0, prompt=[1, 2, 3],
                sampling=SamplingParams(temperature=0.0,
                                        frequency_penalty=1000.0,
                                        max_new_tokens=20))
    eng.submit(r)
    eng.run()
    # greedy + a huge frequency penalty: every generated token is distinct
    assert len(r.tokens) == 20
    assert len(set(r.tokens)) == len(r.tokens), r.tokens


def test_presence_penalty_forbids_repeats(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                           decode_block=4,
                                           track_history=True))
    r = Request(rid=0, prompt=[5],
                sampling=SamplingParams(temperature=0.0,
                                        presence_penalty=1000.0,
                                        max_new_tokens=16))
    eng.submit(r)
    eng.run()
    assert len(set(r.tokens)) == len(r.tokens), r.tokens


def test_logit_bias_dominates_greedy(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                           decode_block=4,
                                           track_history=True))
    r = Request(rid=0, prompt=[1, 2],
                sampling=SamplingParams(temperature=0.0,
                                        logit_bias=((37, 1000.0),),
                                        max_new_tokens=8))
    eng.submit(r)
    eng.run()
    # the +1000 bias wins every step, including the first sampled token
    assert r.tokens == [37] * 8, r.tokens


def test_negative_bias_bans_token(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                           decode_block=4,
                                           track_history=True))
    # run once unbiased to find the model's favourite token, then ban it
    r0 = Request(rid=0, prompt=[9], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=6))
    eng.submit(r0)
    eng.run()
    fav = max(set(r0.tokens), key=r0.tokens.count)
    eng2 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=4,
                                            track_history=True))
    r1 = Request(rid=1, prompt=[9], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=6, logit_bias=((fav, -1e9),)))
    eng2.submit(r1)
    eng2.run()
    assert fav not in r1.tokens, (fav, r1.tokens)


def test_penalties_require_track_history(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="track_history"):
        eng.submit(Request(rid=0, prompt=[1], sampling=SamplingParams(
            frequency_penalty=0.5)))
    with pytest.raises(ValueError, match="track_history"):
        eng.submit(Request(rid=1, prompt=[1], sampling=SamplingParams(
            logit_bias=((3, 1.0),))))
    eng2 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64,
                                            track_history=True))
    with pytest.raises(ValueError, match="outside vocab"):
        eng2.submit(Request(rid=2, prompt=[1], sampling=SamplingParams(
            logit_bias=((9999, 1.0),))))


def test_min_new_tokens_suppresses_eos(setup):
    cfg, params = setup
    # find the natural greedy first token, use it as EOS: without a floor
    # the request would finish immediately
    eng0 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=4,
                                            track_history=True))
    r0 = Request(rid=0, prompt=[7, 8], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=4))
    eng0.submit(r0)
    eng0.run()
    eos = r0.tokens[0]
    eng1 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=4,
                                            track_history=True))
    r1 = Request(rid=1, prompt=[7, 8], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=12, eos_token=eos,
        min_new_tokens=8))
    eng1.submit(r1)
    eng1.run()
    assert len(r1.tokens) >= 8, r1.tokens
    assert eos not in r1.tokens[:7], r1.tokens  # suppressed below the floor

    # min_new_tokens without track_history is a clean error
    eng2 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="track_history"):
        eng2.submit(Request(rid=2, prompt=[1], sampling=SamplingParams(
            min_new_tokens=2)))


def test_stop_sequences_trimmed(setup):
    cfg, params = setup
    # run unconstrained, grab a mid-stream bigram as the stop sequence
    eng0 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=4))
    r0 = Request(rid=0, prompt=[3, 4], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=10))
    eng0.submit(r0)
    eng0.run()
    stop = tuple(r0.tokens[4:6])
    eng1 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=4))
    r1 = Request(rid=1, prompt=[3, 4], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=10, stop_sequences=(stop,)))
    eng1.submit(r1)
    eng1.run()
    # finished at the stop sequence, suffix trimmed
    assert r1.tokens == r0.tokens[:4], (r1.tokens, r0.tokens)
    assert len(r1.logprobs) == len(r1.tokens)
