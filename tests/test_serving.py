"""Continuous-batching engine tests (tiny INT4 model, CPU).

Key property: continuous batching must produce the SAME tokens as running
each request alone (greedy), while interleaving prefill/decode across slots.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams
from piquant_tpu.serving.sampler import sample

SEED = 0x9032002


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny()
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)), bits=4)
    return cfg, params


def _reference_generate(cfg, params, prompt, n_new):
    """Single-request greedy generation, no engine."""
    cache = M.init_kv_cache(cfg, 1, max_len=128)
    logits, cache = M.prefill(cfg, params, jnp.asarray([prompt], jnp.int32), cache)
    toks = []
    tok = int(logits.argmax(-1)[0])
    pos = len(prompt)
    for _ in range(n_new):
        toks.append(tok)
        logits, cache = M.decode_step(
            cfg, params, jnp.asarray([tok], jnp.int32),
            jnp.asarray([pos], jnp.int32), cache)
        tok = int(logits.argmax(-1)[0])
        pos += 1
    return toks


def test_engine_matches_single_request_generation(setup):
    cfg, params = setup
    rng = np.random.default_rng(SEED)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, int(rng.integers(3, 12)))))
               for _ in range(5)]
    n_new = 6

    want = [_reference_generate(cfg, params, p, n_new) for p in prompts]

    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=128,
                                           prefill_pad=4))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=n_new)))
    done = eng.run()
    assert len(done) == 5
    for i, req in enumerate(sorted(done, key=lambda r: r.rid)):
        assert req.tokens == want[i], (i, req.tokens, want[i])
        assert req.ttft_s is not None and req.ttft_s >= 0

    m = eng.metrics
    assert m.decode_tokens > 0 and m.decode_tokens_per_s > 0
    assert m.p50_ttft_ms() > 0
    # 5 requests on 2 slots forces at least one wave of continuous admission
    assert m.prefill_tokens == sum(len(p) for p in prompts)


def test_engine_eos_stops_early(setup):
    cfg, params = setup
    # run one request with eos = its own first generated token -> stops at 1
    prompt = [5, 6, 7]
    first = _reference_generate(cfg, params, prompt, 1)[0]
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64,
                                           prefill_pad=4))
    eng.submit(Request(rid=0, prompt=prompt,
                       sampling=SamplingParams(max_new_tokens=50, eos_token=first)))
    done = eng.run()
    assert done[0].tokens == [first]


def test_engine_capacity_validation(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=16,
                                           prefill_pad=4))
    eng.submit(Request(rid=0, prompt=list(range(1, 13)),
                       sampling=SamplingParams(max_new_tokens=10)))
    with pytest.raises(ValueError):
        eng.run()


def test_sampler_modes():
    key = jax.random.key(0)
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    assert int(sample(logits, SamplingParams(temperature=0.0), None)[0]) == 1
    t = sample(logits, SamplingParams(temperature=0.5, top_k=2), key)
    assert int(t[0]) in (1, 2)
    t = sample(logits, SamplingParams(temperature=1.0, top_p=0.5), key)
    assert int(t[0]) == 1  # p(1) dominates past 0.5


def test_chunked_prefill_engine(setup):
    cfg, params = setup
    n_new = 5
    prompts = [[1, 2, 3, 4, 5, 6, 7], [9, 8, 7, 6, 5], [4, 4, 4]]

    def run_engine(chunk):
        eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                               prefill_pad=4,
                                               prefill_chunk=chunk))
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p,
                               sampling=SamplingParams(max_new_tokens=n_new)))
        return sorted(eng.run(), key=lambda r: r.rid)

    a = run_engine(4)
    b = run_engine(4)
    for ra, rb in zip(a, b):
        assert len(ra.tokens) == n_new
        assert ra.tokens == rb.tokens  # deterministic

    # chunked prefill logits stay close to one-shot prefill (int8 readback)
    from piquant_tpu.models import llama as M

    prompt = jnp.asarray([prompts[0]], jnp.int32)
    cache1 = M.init_kv_cache(cfg, 1, max_len=64)
    l_one, _ = M.prefill(cfg, params, prompt, cache1)
    cache2 = M.init_kv_cache(cfg, 1, max_len=64)
    padded = prompts[0] + [0]  # pad to multiple of 4
    l_ch = None
    for i in range(0, 8, 4):
        is_final = i + 4 >= 8
        lp = jnp.asarray([len(prompts[0]) - 1 - i if is_final else 0], jnp.int32)
        pos = jnp.asarray([i], jnp.int32)[:, None] + jnp.arange(4, dtype=jnp.int32)[None]
        logits, cache2 = M.forward(cfg, params,
                                   jnp.asarray([padded[i:i+4]], jnp.int32),
                                   positions=pos, cache=cache2,
                                   logit_positions=lp)
        l_ch = logits[:, 0]
    rel = float(jnp.abs(l_ch - l_one).max() / jnp.abs(l_one).max())
    assert rel < 0.05, rel


def test_chunked_prefill_near_capacity(setup):
    """Chunked admission whose padded length would exceed max_seq_len: the
    final chunk window is shifted back (never written past the cache end) and
    the greedy output must match an unconstrained run.  Regression: the
    padded final chunk used to hit the KV append's DUS index clamp, silently
    shifting the real entries (ADVICE r1, medium)."""
    cfg, params = setup
    prompt = list(range(1, 28))  # plen=27, chunk 8 -> old padded len 32 > 30
    n_new = 3
    want = _reference_generate(cfg, params, prompt, n_new)

    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=30,
                                           prefill_chunk=8))
    eng.submit(Request(rid=0, prompt=prompt,
                       sampling=SamplingParams(max_new_tokens=n_new)))
    done = eng.run()
    assert done[0].tokens == want, (done[0].tokens, want)


def test_one_shot_prefill_pad_clamped(setup):
    """One-shot admission caps the prefill_pad bucket at max_seq_len (used
    to fail with a shape error when plen rounded past the cache)."""
    cfg, params = setup
    prompt = list(range(1, 28))  # plen=27, pad 8 -> 32 > 30
    n_new = 3
    want = _reference_generate(cfg, params, prompt, n_new)
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=30,
                                           prefill_pad=8))
    eng.submit(Request(rid=0, prompt=prompt,
                       sampling=SamplingParams(max_new_tokens=n_new)))
    done = eng.run()
    assert done[0].tokens == want, (done[0].tokens, want)


def test_submit_rejects_oversized_top_k(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=16))
    with pytest.raises(ValueError, match="top_k"):
        eng.submit(Request(rid=0, prompt=[1, 2],
                           sampling=SamplingParams(temperature=1.0, top_k=500)))


def test_sample_batch_matches_per_row():
    """sample_batch with traced per-row params == sample() per row (same key
    handling for greedy; masked-support equivalence for stochastic rows)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piquant_tpu.serving.sampler import SamplingParams, sample, sample_batch

    key = jax.random.key(11)
    logits = jax.random.normal(jax.random.key(5), (4, 64), jnp.float32) * 3.0

    # all-greedy: must match argmax exactly regardless of k/p settings
    toks = sample_batch(logits,
                        jnp.zeros((4,), jnp.float32),
                        jnp.asarray([0, 5, 0, 3], jnp.int32),
                        jnp.asarray([1.0, 0.9, 0.5, 1.0], jnp.float32), key)
    assert np.array_equal(np.asarray(toks), np.asarray(jnp.argmax(logits, -1)))

    # stochastic rows: every draw must land in the allowed (top-k/top-p) set
    temps = jnp.asarray([0.8, 0.8, 0.8, 0.8], jnp.float32)
    topks = jnp.asarray([5, 0, 1, 64], jnp.int32)
    topps = jnp.asarray([1.0, 0.9, 1.0, 1.0], jnp.float32)
    for i in range(20):
        k = jax.random.fold_in(key, i)
        toks = np.asarray(sample_batch(logits, temps, topks, topps, k))
        # row 2: top_k=1 == greedy
        assert toks[2] == int(jnp.argmax(logits[2]))
        # row 0: token must be among the top-5 logits
        top5 = np.argsort(np.asarray(logits[0]))[-5:]
        assert toks[0] in top5
        # row 1: token must be inside the top-p=0.9 nucleus
        p = jax.nn.softmax(logits[1] / 0.8)
        order = np.argsort(-np.asarray(p))
        cum = np.cumsum(np.asarray(p)[order])
        nucleus = set(order[: int(np.argmax(cum >= 0.9)) + 1].tolist())
        assert toks[1] in nucleus


def test_interleaved_chunked_admission_soak():
    """Chunked admission interleaves with decode (one chunk per tick):
    churn many mixed-length requests with random EOS through few slots and
    check completion, token-count invariants, and determinism."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piquant_tpu.models import llama as M
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg = M.LlamaConfig.tiny(vocab=64, dtype=jnp.float32)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(0)), bits=8)
    def run_once():
        rng = np.random.default_rng(5)  # fresh per run: identical workload
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=3, max_seq_len=128, prefill_chunk=8, decode_block=4))
        reqs = []
        for i in range(9):
            plen = int(rng.integers(3, 40)) if i % 3 else 33
            prompt = (rng.integers(1, 60, plen)).tolist()
            # eos_token=0 fires at random; max_new bounds the rest
            reqs.append(Request(rid=i, prompt=prompt,
                                sampling=SamplingParams(max_new_tokens=11,
                                                        eos_token=0)))
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        return sorted(done, key=lambda r: r.rid)

    a = run_once()
    b = run_once()
    assert len(a) == 9
    for ra, rb in zip(a, b):
        assert ra.done and 1 <= len(ra.tokens) <= 11
        if 0 in ra.tokens:
            assert ra.tokens[-1] == 0 and 0 not in ra.tokens[:-1]
        assert ra.tokens == rb.tokens  # deterministic under interleaving
        assert ra.ttft_s is not None and ra.ttft_s > 0


def test_speculative_greedy_identical():
    """Prompt-lookup speculative decoding must emit EXACTLY the same greedy
    tokens as normal decode — on repetitive prompts (high acceptance) and
    random ones (mostly rejected drafts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piquant_tpu.models import llama as M
    from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams

    cfg = M.LlamaConfig.tiny(vocab=64, dtype=jnp.float32)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(0)), bits=8)
    rng = np.random.default_rng(3)
    prompts = [
        ([5, 9, 11, 5, 9, 11, 5, 9, 11, 5, 9] * 2)[:20],   # repetitive
        rng.integers(1, 60, 17).tolist(),                   # random
        ([7, 7, 8, 8, 7, 7, 8, 8] * 3)[:21],                # periodic
    ]

    def run(spec):
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=2, max_seq_len=128, decode_block=3, speculate=spec))
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p,
                               sampling=SamplingParams(max_new_tokens=24)))
        return [r.tokens for r in sorted(eng.run(), key=lambda r: r.rid)]

    base = run(0)
    spec = run(4)
    assert [len(t) for t in base] == [24, 24, 24]
    assert spec == base


def test_ngram_draft_lookup():
    import jax.numpy as jnp
    import numpy as np

    from piquant_tpu.models.speculative import ngram_draft

    #          0  1  2  3  4  5  6  7
    hist = jnp.asarray([[3, 4, 9, 8, 3, 4, 7, 0, 0, 0]], jnp.int32)
    # current bigram at pos=5 is (3, 4); earlier occurrence ends at j=1 ->
    # draft continues with hist[2:5] = 9, 8, 3
    d = np.asarray(ngram_draft(hist, jnp.asarray([5]), 3))
    assert d.tolist() == [[9, 8, 3]]
    # no match -> zeros
    hist2 = jnp.asarray([[1, 2, 3, 4, 5, 0, 0, 0, 0, 0]], jnp.int32)
    d2 = np.asarray(ngram_draft(hist2, jnp.asarray([4]), 3))
    assert d2.tolist() == [[0, 0, 0]]


def test_engine_moe_model():
    """The engine is model-agnostic: a quantized MoE (Mixtral-style) model
    must serve greedily identical to single-request generation."""
    cfg = M.LlamaConfig.tiny(n_experts=4, moe_top_k=2)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED + 9)),
                               bits=4)
    rng = np.random.default_rng(SEED + 10)
    prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (5, 9)]
    want = [_reference_generate(cfg, params, p, 6) for p in prompts]

    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=6)))
    done = eng.run()
    got = [r.tokens for r in sorted(done, key=lambda r: r.rid)]
    assert got == want


def test_engine_attn_window_buckets(setup):
    """Window buckets (AOT-warmed at construction) must not change greedy
    output: attention over [0, bucket) is exact while contexts fit."""
    cfg, params = setup
    rng = np.random.default_rng(SEED + 20)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, 7)))
               for _ in range(2)]
    want = [_reference_generate(cfg, params, p, 5) for p in prompts]

    eng = Engine(cfg, params,
                 EngineConfig(batch_slots=2, max_seq_len=64,
                              attn_windows=(32, 64), decode_block=4))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=5)))
    done = eng.run()
    got = [r.tokens for r in sorted(done, key=lambda r: r.rid)]
    assert got == want


def test_engine_mla_model():
    """The engine serves MLA models (latent INT8 cache): slot surgery and
    decode blocks are cache-pytree-generic.  Greedy output must equal
    single-request stepwise generation."""
    from piquant_tpu.models import mla as L

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(SEED % 997)),
                               bits=8)
    rng = np.random.default_rng(SEED + 30)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, n)))
               for n in (5, 9)]
    n_new = 5

    def ref_gen(prompt):
        cache = L.init_kv_cache(cfg, 1, max_len=64)
        lg, cache = L.prefill(cfg, params, jnp.asarray([prompt], jnp.int32),
                              cache)
        toks = []
        tok = int(lg.argmax(-1)[0])
        pos = len(prompt)
        for _ in range(n_new):
            toks.append(tok)
            lg, cache = L.decode_step(cfg, params,
                                      jnp.asarray([tok], jnp.int32),
                                      jnp.asarray([pos], jnp.int32), cache)
            tok = int(lg.argmax(-1)[0])
            pos += 1
        return toks

    want = [ref_gen(p) for p in prompts]

    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                           prefill_pad=4))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=n_new)))
    done = eng.run()
    got = [r.tokens for r in sorted(done, key=lambda r: r.rid)]
    assert got == want


def test_engine_mla_chunked_and_windows():
    """MLA engine parity features (VERDICT r1 #8): chunked prefill through
    the absorbed latent path and attention-window buckets must reproduce
    the roomy-config greedy output."""
    from piquant_tpu.models import mla as L

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(SEED % 991)),
                               bits=8)
    rng = np.random.default_rng(SEED + 31)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, n)))
               for n in (11, 6)]
    n_new = 5

    def run(ec):
        eng = Engine(cfg, params, ec)
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p,
                               sampling=SamplingParams(max_new_tokens=n_new)))
        return [r.tokens for r in sorted(eng.run(), key=lambda r: r.rid)]

    want = run(EngineConfig(batch_slots=2, max_seq_len=64))
    got_chunk = run(EngineConfig(batch_slots=2, max_seq_len=64,
                                 prefill_chunk=4))
    got_win = run(EngineConfig(batch_slots=2, max_seq_len=64,
                               attn_windows=(32, 64), decode_block=4))
    # window buckets are exact while contexts fit; chunked prefill attends
    # over quantized in-chunk latents (int8 readback) — near-tie-aware
    # comparison (cross-path noise can flip a ~5e-3-margin argmax)
    from tests.token_guard import assert_tokens_match_guarded

    for i, p in enumerate(prompts):
        fwd = lambda tt: L.forward(cfg, params, tt)[0]
        assert_tokens_match_guarded(fwd, p, got_win[i], want[i],
                                    tag=f"win req {i}")
        assert_tokens_match_guarded(fwd, p, got_chunk[i], want[i],
                                    tag=f"chunk req {i}")


def test_repetition_penalty_greedy_matches_reference(setup):
    """Greedy decode with repetition_penalty through the engine
    (track_history + in-scan penalty) must equal a manual loop applying
    the HF/CTRL rule (seen logit l>0 -> l/pen else l*pen over
    prompt+generated) — and must differ from the unpenalized stream."""
    cfg, params = setup
    prompt = [7, 3, 7, 3, 7, 3]
    n_new, pen = 10, 1.8

    # oracle
    cache = M.init_kv_cache(cfg, 1, max_len=128)
    logits, cache = M.prefill(cfg, params, jnp.asarray([prompt], jnp.int32),
                              cache)
    seen = set(prompt)
    def penalize(lg):
        lg = np.asarray(lg, np.float64).copy()
        for t in seen:
            lg[t] = lg[t] / pen if lg[t] > 0 else lg[t] * pen
        return lg
    tok = int(penalize(logits[0]).argmax())
    want, pos = [], len(prompt)
    for _ in range(n_new):
        want.append(tok)
        seen.add(tok)
        logits, cache = M.decode_step(cfg, params,
                                      jnp.asarray([tok], jnp.int32),
                                      jnp.asarray([pos], jnp.int32), cache)
        tok = int(penalize(logits[0]).argmax())
        pos += 1

    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                           decode_block=3,
                                           track_history=True))
    eng.submit(Request(rid=0, prompt=prompt, sampling=SamplingParams(
        max_new_tokens=n_new, repetition_penalty=pen)))
    got = eng.run()[0].tokens
    assert got == want

    eng2 = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                            decode_block=3))
    eng2.submit(Request(rid=0, prompt=prompt,
                        sampling=SamplingParams(max_new_tokens=n_new)))
    plain = eng2.run()[0].tokens
    assert plain != got  # the penalty actually changed the stream


def test_repetition_penalty_requires_track_history(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="track_history"):
        eng.submit(Request(rid=0, prompt=[1, 2], sampling=SamplingParams(
            repetition_penalty=1.3)))


def test_min_p_restricts_candidates(setup):
    """min_p=1.0 forces p >= p_max, i.e. only argmax-tied tokens survive —
    stochastic sampling must then equal greedy."""
    cfg, params = setup
    prompt = [5, 9, 2, 4]

    def run(sp):
        eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64),
                     rng_seed=3)
        eng.submit(Request(rid=0, prompt=prompt, sampling=sp))
        return eng.run()[0].tokens

    greedy = run(SamplingParams(max_new_tokens=8))
    minp = run(SamplingParams(max_new_tokens=8, temperature=1.0, min_p=1.0))
    assert minp == greedy


def test_stop_tokens(setup):
    """Generation stops at the first token in stop_tokens."""
    cfg, params = setup
    prompt = [5, 9, 2, 4]
    base_eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    base_eng.submit(Request(rid=0, prompt=prompt,
                            sampling=SamplingParams(max_new_tokens=12)))
    base = base_eng.run()[0].tokens
    stop = base[4]  # stop at the 5th emitted token
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    eng.submit(Request(rid=0, prompt=prompt, sampling=SamplingParams(
        max_new_tokens=12, stop_tokens=(stop,))))
    got = eng.run()[0].tokens
    assert got == base[:base.index(stop) + 1]


def test_logprobs_match_reference(setup):
    """Every emitted token carries its raw-model log-probability; values
    must match log_softmax of the reference decode logits at the chosen
    tokens, and the speculative path must report the same numbers as
    normal decode for greedy requests."""
    cfg, params = setup
    prompt = [5, 9, 2, 4, 9, 2]
    n_new = 8

    # reference: manual loop
    cache = M.init_kv_cache(cfg, 1, max_len=128)
    logits, cache = M.prefill(cfg, params, jnp.asarray([prompt], jnp.int32),
                              cache)
    def lp_of(lg, t):
        lg = np.asarray(lg, np.float64)
        return float(lg[t] - np.log(np.exp(lg - lg.max()).sum()) - lg.max())
    tok = int(logits.argmax(-1)[0])
    want_lp, pos = [lp_of(logits[0], tok)], len(prompt)
    for _ in range(n_new - 1):
        logits, cache = M.decode_step(cfg, params,
                                      jnp.asarray([tok], jnp.int32),
                                      jnp.asarray([pos], jnp.int32), cache)
        tok = int(logits.argmax(-1)[0])
        want_lp.append(lp_of(logits[0], tok))
        pos += 1

    def run(**ekw):
        eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=128,
                                               decode_block=3, **ekw))
        eng.submit(Request(rid=0, prompt=prompt,
                           sampling=SamplingParams(max_new_tokens=n_new)))
        r = eng.run()[0]
        assert len(r.logprobs) == len(r.tokens) == n_new
        return r.logprobs

    got = run()
    np.testing.assert_allclose(got, want_lp, atol=5e-3)
    got_spec = run(speculate=3)
    np.testing.assert_allclose(got_spec, want_lp, atol=5e-3)
    got_rep = run(track_history=True)
    np.testing.assert_allclose(got_rep, want_lp, atol=5e-3)


def test_repetition_penalty_chunked_prefill_first_token(setup):
    """The chunked-prefill path must apply the repetition penalty to the
    FIRST sampled token too (it goes through _sample_first, not
    _jit_prefill) — same greedy stream as the one-shot path."""
    cfg, params = setup
    prompt = [7, 3, 7, 3, 7, 3, 7, 3]

    def run(chunk):
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=1, max_seq_len=128, decode_block=3,
            track_history=True, prefill_chunk=chunk))
        eng.submit(Request(rid=0, prompt=prompt, sampling=SamplingParams(
            max_new_tokens=8, repetition_penalty=1.8)))
        return eng.run()[0].tokens

    # one-shot vs chunked: identical penalized greedy streams (the chunked
    # cache holds int8-readback KV — logits differ at float-noise level,
    # but the first token sees the same penalty mask)
    assert run(None)[0] == run(4)[0]


def test_single_shot_sample_min_p_and_penalty():
    from piquant_tpu.serving.sampler import sample

    rng = np.random.default_rng(SEED + 41)
    logits = jnp.asarray(rng.normal(0, 1, (2, 32)), jnp.float32)
    # min_p=1.0 restricts to the argmax even at temperature
    t = sample(logits, SamplingParams(temperature=1.0, min_p=1.0),
               jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(t),
                                  np.asarray(logits.argmax(-1)))
    # penalty without history: explicit error, not silent ignore
    with pytest.raises(ValueError, match="history"):
        sample(logits, SamplingParams(temperature=1.0,
                                      repetition_penalty=1.5),
               jax.random.key(0))
    # with history: the penalized token loses a near-tie
    lg = jnp.zeros((1, 8)).at[0, 3].set(1.0).at[0, 5].set(0.95)
    hist = jnp.asarray([[3, 3, 3]], jnp.int32)
    t = sample(lg, SamplingParams(repetition_penalty=2.0), None, history=hist)
    assert int(t[0]) == 5


def test_run_stream_yields_tokens_in_order(setup):
    """run_stream() must yield every emitted (request, token) pair, in
    per-request order, and produce the same final streams as run()."""
    cfg, params = setup
    prompts = [[5, 9, 2], [4, 4, 4, 4]]

    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                           decode_block=3))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=7)))
    streamed = {0: [], 1: []}
    for req, tok in eng.run_stream():
        streamed[req.rid].append(tok)

    eng2 = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                            decode_block=3))
    for i, p in enumerate(prompts):
        eng2.submit(Request(rid=i, prompt=p,
                            sampling=SamplingParams(max_new_tokens=7)))
    batch = {r.rid: r.tokens for r in eng2.run()}
    # the first token is emitted at admission (before any stream tick)
    for rid in (0, 1):
        assert batch[rid][1:] == streamed[rid] or batch[rid] == streamed[rid]


def test_cancel_request(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64,
                                           decode_block=2))
    eng.submit(Request(rid=0, prompt=[1, 2, 3],
                       sampling=SamplingParams(max_new_tokens=40)))
    eng.submit(Request(rid=1, prompt=[4, 5],
                       sampling=SamplingParams(max_new_tokens=4)))
    # cancel the queued request before it is admitted
    assert eng.cancel(1)
    # cancel the in-flight request after a few streamed tokens
    seen = 0
    for req, tok in eng.run_stream():
        if req.rid == 0:
            seen += 1
            if seen == 4:
                assert eng.cancel(0)
    out = {r.rid: r for r in eng._all}
    assert out[0].done and 4 <= len(out[0].tokens) < 40
    assert out[1].done and out[1].tokens == []
    assert not eng.cancel(0)  # already finished
    assert not eng.cancel(99)


# ---------------------------------------------------------------------------
# prefix caching (EngineConfig.prefix_cache)
# ---------------------------------------------------------------------------

def _run_with_prefix(cfg, params, prompts, n_new, *, prefix_cache=0,
                     auto=False, preseed=None):
    eng = Engine(cfg, params, EngineConfig(
        batch_slots=2, max_seq_len=64, prefill_chunk=4,
        prefix_cache=prefix_cache, prefix_cache_auto=auto))
    if preseed is not None:
        eng.preseed_prefix(preseed)
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p,
                           sampling=SamplingParams(max_new_tokens=n_new)))
    out = sorted(eng.run(), key=lambda r: r.rid)
    return out, eng


def test_prefix_cache_preseed_identical_tokens(setup):
    """A preseeded system prompt must not change ANY generated token, and
    the matching prompts must skip the shared prefill work (metrics)."""
    cfg, params = setup
    sys_prompt = [7, 3, 9, 1, 5, 2, 8, 6]          # 8 = 2 complete chunks
    prompts = [sys_prompt + [11, 12, 13],
               sys_prompt + [4],
               [9, 9, 9, 2]]                        # no shared prefix
    base, _ = _run_with_prefix(cfg, params, prompts, 6)
    got, eng = _run_with_prefix(cfg, params, prompts, 6,
                                prefix_cache=4, preseed=sys_prompt)
    for rb, rg in zip(base, got):
        assert rb.tokens == rg.tokens, (rb.rid, rb.tokens, rg.tokens)
    assert eng.metrics.prefix_hits == 2
    assert eng.metrics.prefix_tokens_saved == 16


def test_prefix_cache_exact_match(setup):
    """Prompt == preseeded tokens: everything but the last position is
    reused and the output still matches the uncached engine."""
    cfg, params = setup
    sys_prompt = [7, 3, 9, 1, 5, 2, 8, 6]
    base, _ = _run_with_prefix(cfg, params, [list(sys_prompt)], 6)
    got, eng = _run_with_prefix(cfg, params, [list(sys_prompt)], 6,
                                prefix_cache=2, preseed=sys_prompt)
    assert base[0].tokens == got[0].tokens
    assert eng.metrics.prefix_hits == 1
    assert eng.metrics.prefix_tokens_saved == 7   # plen-1: last pos re-run


def test_prefix_cache_auto_capture(setup):
    """prefix_cache_auto: the second identical prompt hits the pool entry
    captured from the first admission and generates the same tokens."""
    cfg, params = setup
    prompt = [5, 1, 4, 2, 8, 3, 7, 7, 2]
    base, _ = _run_with_prefix(cfg, params, [list(prompt), list(prompt)], 5)
    got, eng = _run_with_prefix(cfg, params, [list(prompt), list(prompt)], 5,
                                prefix_cache=2, auto=True)
    for rb, rg in zip(base, got):
        assert rb.tokens == rg.tokens
    assert eng.metrics.prefix_hits >= 1
    assert eng.metrics.prefix_tokens_saved >= 8   # 2 complete chunks


def test_prefix_cache_lru_eviction(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(
        batch_slots=2, max_seq_len=64, prefill_chunk=4, prefix_cache=1))
    a, b = [1, 2, 3, 4], [5, 6, 7, 8]
    eng.preseed_prefix(a)
    eng.preseed_prefix(b)                 # capacity 1: evicts a
    assert list(eng._prefix_pool) == [(0, tuple(b))]  # (adapter_id, tokens)


def test_prefix_cache_requires_chunked(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="prefill_chunk"):
        Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                         prefix_cache=2))


def test_prefix_cache_mla_model():
    """The prefix pool is cache-pytree-generic: MLA latent caches reuse
    pooled prefixes with identical outputs."""
    from piquant_tpu.models import mla as L

    cfg = L.MLAConfig.tiny(dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(SEED % 991)),
                               bits=8)
    sysp = [3, 7, 1, 9, 5, 2, 4, 8]
    prompts = [sysp + [11, 6], sysp + [2]]
    n_new = 5

    def run(prefix):
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=2, max_seq_len=64, prefill_chunk=4,
            prefix_cache=prefix))
        if prefix:
            eng.preseed_prefix(sysp)
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p,
                               sampling=SamplingParams(max_new_tokens=n_new)))
        toks = [r.tokens for r in sorted(eng.run(), key=lambda r: r.rid)]
        return toks, eng

    want, _ = run(0)
    got, eng = run(4)
    assert got == want, (got, want)
    assert eng.metrics.prefix_hits == 2


# ---------------------------------------------------------------------------
# snapshot / restore (preemption-safe serving)
# ---------------------------------------------------------------------------

def test_engine_snapshot_restore_identical(setup, tmp_path):
    """Kill-and-resume: snapshot mid-generation, restore into a FRESH
    engine, finish — every request's tokens match an uninterrupted run."""
    cfg, params = setup
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4]]
    n_new = 8

    def make(reqs=True):
        eng = Engine(cfg, params, EngineConfig(
            batch_slots=2, max_seq_len=64, decode_block=4,
            prefill_chunk=4, prefix_cache=2))
        if reqs:
            for i, p in enumerate(prompts):
                eng.submit(Request(rid=i, prompt=list(p),
                                   sampling=SamplingParams(
                                       max_new_tokens=n_new)))
        return eng

    want = {r.rid: r.tokens for r in make().run()}

    eng = make()
    eng._admit()
    eng._step_decode()  # a couple of decode blocks, then "preemption"
    eng._step_decode()
    path = str(tmp_path / "engine.pkl")
    eng.save(path)

    eng2 = make(reqs=False)
    eng2.load(path)
    got = {r.rid: r.tokens for r in eng2.run()}
    assert got == want, (got, want)


def test_engine_snapshot_rejects_mid_admission(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64,
                                           prefill_chunk=4))
    eng.submit(Request(rid=0, prompt=list(range(1, 12)),
                       sampling=SamplingParams(max_new_tokens=2)))
    eng._admit(max_chunks=1)      # chunked prefill left in flight
    with pytest.raises(ValueError, match="mid-admission"):
        eng.snapshot()


def test_batched_admission_single_dispatch(setup):
    """Burst arrivals of one pad bucket prefill in ONE device dispatch
    (engine._admit_one_shot batching) with identical tokens to
    sequential admission."""
    cfg, params = setup
    rng = np.random.default_rng(SEED + 77)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, 6)))
               for _ in range(4)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(batched):
        eng = Engine(cfg, params, EngineConfig(batch_slots=4, max_seq_len=64,
                                               decode_block=4))
        calls = []
        orig = eng._prefill

        def spy(*a, **k):
            calls.append(a[1].shape)   # tokens [Bq, T]
            return orig(*a, **k)

        eng._prefill = spy
        reqs = [Request(rid=i, prompt=list(p), sampling=sp)
                for i, p in enumerate(prompts)]
        if batched:
            for r in reqs:
                eng.submit(r)
            eng.run()
        else:
            for r in reqs:          # sequential: admit+drain one at a time
                eng.submit(r)
                eng.run()
        return [list(r.tokens) for r in reqs], calls

    want, seq_calls = run(batched=False)
    got, burst_calls = run(batched=True)
    assert got == want
    assert len(seq_calls) == 4 and all(s[0] == 1 for s in seq_calls)
    assert len(burst_calls) == 1 and burst_calls[0][0] == 4  # ONE dispatch
