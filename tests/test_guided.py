"""Guided (constrained) decoding: regex/JSON-schema grammars enforced by
the engine's jitted decode scan (serving/guided.py + engine integration).

Host layer: DFA correctness, token-table closure, dead-end pruning,
JSON-schema lowering.  Engine layer: every guided request's emitted text
matches the grammar (greedy AND sampled, one-shot AND chunked prefill,
mixed with unguided slots), logprobs stay raw-model, and snapshot/restore
preserves guided state.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams
from piquant_tpu.serving.guided import (TokenGuide, json_schema_regex,
                                        regex_to_dfa)

SEED = 0x6D17


# toy vocab: id -> string over the model's 64-token vocab
def _vocab64():
    v = ["<eos>"]
    v += list("abcdefghijklmnopqrstuvwxyz")  # 1..26 single letters
    v += ["ab", "cd", "ef", "gh", "ij"]      # 27..31 bigrams
    v += list("0123456789")                  # 32..41 digits
    v += list('{}[]":,.-')                   # 42..50 JSON punctuation
    v += ["true", "false", "null", "10", "42"]  # 51..55
    while len(v) < 64:
        v.append(f"<unused{len(v)}>")
    return v


VOCAB = _vocab64()


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny(vocab=64)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)),
                               bits=4)
    return cfg, params


# ---------------------------------------------------------------------------
# host layer
# ---------------------------------------------------------------------------

def test_dfa_matches_python_re():
    import re

    cases = [
        ("(ab|cd)*ef{2,3}", ["abeff", "efff", "cdabeff", "abef", "x", ""]),
        ("[a-c]+\\d{1,2}", ["a1", "abc99", "d1", "a", "a123"]),
        ("-?(0|[1-9][0-9]*)", ["0", "-12", "007", "-0", "5"]),
        ("a(b|c)?d", ["ad", "abd", "acd", "abcd"]),
    ]
    for pat, texts in cases:
        d = regex_to_dfa(pat)
        for t in texts:
            sid = d.walk(d.start, t)
            got = sid != -1 and d.accepting(sid)
            want = re.fullmatch(pat, t) is not None
            assert got == want, (pat, t, got, want)


def test_token_table_closure_and_pruning():
    g = TokenGuide.from_regex("(ab|cd)*ef{2,3}", VOCAB, eos_id=0)
    # lone "c" leads to a tokenizer dead-end (no lone "d" token reaches
    # acceptance? "d" IS in the vocab here, so "c" survives) — use a
    # vocab slice without "d" to exercise pruning:
    v2 = [t for t in VOCAB]
    v2[4] = "<unused_d>"  # remove the lone "d"
    g2 = TokenGuide.from_regex("(ab|cd)*ef{2,3}", v2, eos_id=0)
    c_id = VOCAB.index("c")
    assert g.mask[0, c_id]        # with "d" available, "c" is fine
    assert not g2.mask[0, c_id]   # without it, "c" is pruned as a dead end
    # every allowed path stays completable: random walks always terminate
    # in an accepting state
    rng = np.random.default_rng(0)
    for _ in range(100):
        s = 0
        for _ in range(50):
            allowed = np.flatnonzero(g2.mask[s])
            assert allowed.size
            t = int(rng.choice(allowed))
            if t == 0:
                assert g2.accept[s]
                break
            s = int(g2.trans[s, t])
        else:
            raise AssertionError("walk did not terminate")


def test_unsatisfiable_grammar_raises():
    with pytest.raises(ValueError, match="unsatisfiable"):
        TokenGuide.from_regex("Z+", VOCAB, eos_id=0)  # no uppercase tokens


def test_check_oracle():
    g = TokenGuide.from_regex("(ab|cd)+", VOCAB, eos_id=0)
    ab, cd, a, b = (VOCAB.index(t) for t in ("ab", "cd", "a", "b"))
    assert g.check([ab, cd])
    assert g.check([a, b])
    assert not g.check([a])
    assert not g.check([])


def test_json_schema_regex_accepts_exactly():
    schema = {"type": "object",
              "properties": {"id": {"type": "integer"},
                             "ok": {"type": "boolean"},
                             "tag": {"enum": ["x", "y"]}},
              "required": ["id", "ok"]}
    d = regex_to_dfa(json_schema_regex(schema))
    good = ['{"id":7,"ok":true}', '{"id":-3,"ok":false,"tag":"y"}']
    bad = ['{"ok":true,"id":7}', '{"id":7}', '{"id":7,"ok":maybe}',
           '{"id":7,"ok":true,"tag":"z"}']
    for s in good:
        sid = d.walk(d.start, s)
        assert sid != -1 and d.accepting(sid), s
        json.loads(s)
    for s in bad:
        sid = d.walk(d.start, s)
        assert sid == -1 or not d.accepting(sid), s


def test_optional_keys_must_trail():
    with pytest.raises(ValueError, match="trailing"):
        json_schema_regex({"type": "object",
                           "properties": {"a": {"type": "integer"},
                                          "b": {"type": "integer"}},
                           "required": ["b"]})


# ---------------------------------------------------------------------------
# engine layer
# ---------------------------------------------------------------------------

def _decode(tokens, eos=0):
    return "".join(VOCAB[t] for t in tokens if t != eos)


@pytest.mark.parametrize("chunked", [False, True])
def test_engine_guided_outputs_match_grammar(setup, chunked):
    cfg, params = setup
    pat = "(ab|cd){1,6}ef"
    g = TokenGuide.from_regex(pat, VOCAB, eos_id=0)
    ec = EngineConfig(batch_slots=4, max_seq_len=128, decode_block=4,
                      prefill_chunk=16 if chunked else None)
    eng = Engine(cfg, params, ec, rng_seed=1)
    d = regex_to_dfa(pat)
    reqs = []
    for rid in range(6):
        sampling = SamplingParams(
            temperature=0.9 if rid % 2 else 0.0, top_k=0,
            max_new_tokens=24)
        guide = g if rid != 3 else None  # slot 3 runs unguided alongside
        reqs.append(Request(rid=rid, prompt=[1 + rid % 5, 2], guide=guide,
                            sampling=sampling))
        eng.submit(reqs[-1])
    eng.run()
    for r in reqs:
        assert r.done
        if r.guide is None:
            continue
        assert r.tokens[-1] == 0, (r.rid, r.tokens)  # ended with guide EOS
        txt = _decode(r.tokens[:-1])
        sid = d.walk(d.start, txt)
        assert sid != -1 and d.accepting(sid), (r.rid, txt)
        assert len(r.logprobs) == len(r.tokens)


def test_engine_guided_json(setup):
    cfg, params = setup
    schema = {"type": "object",
              "properties": {"id": {"type": "integer"},
                             "ok": {"type": "boolean"}},
              "required": ["id", "ok"]}
    g = TokenGuide.from_json_schema(schema, VOCAB, eos_id=0)
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=128,
                                           decode_block=4))
    reqs = [Request(rid=i, prompt=[3, 4], guide=g,
                    sampling=SamplingParams(temperature=1.2,
                                            max_new_tokens=40))
            for i in range(3)]
    for r in reqs:
        eng.submit(r)
    eng.run()
    for r in reqs:
        obj = json.loads(_decode(r.tokens[:-1]))
        assert isinstance(obj["id"], int) and isinstance(obj["ok"], bool)


def test_engine_guided_snapshot_restore(setup):
    cfg, params = setup
    pat = "(ab|cd){2,8}ef"
    g = TokenGuide.from_regex(pat, VOCAB, eos_id=0)
    ec = EngineConfig(batch_slots=2, max_seq_len=128, decode_block=2)

    def fresh(seed=7):
        return Engine(cfg, params, ec, rng_seed=seed)

    eng = fresh()
    r = Request(rid=0, prompt=[1, 2, 3],
                guide=g, sampling=SamplingParams(temperature=0.8,
                                                 max_new_tokens=20))
    eng.submit(r)
    eng._admit()
    for _ in range(2):
        eng._step_decode()
    snap = eng.snapshot()

    # continue on the original
    eng.run()
    want = list(r.tokens)

    # restore into a fresh engine and continue — identical tokens
    eng2 = fresh()
    eng2.restore(snap)
    r2 = eng2._slots[0] if eng2._slots[0] is not None else eng2._all[0]
    eng2.run()
    assert list(r2.tokens) == want
    d = regex_to_dfa(pat)
    txt = _decode(want[:-1])
    sid = d.walk(d.start, txt)
    assert sid != -1 and d.accepting(sid), txt


def test_server_guided_json(setup):
    """HTTP front-end: guided_json + eos constrain the completion."""
    import urllib.request

    from piquant_tpu.serving.server import EngineServer

    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=128,
                                           decode_block=4))
    srv = EngineServer(eng, vocab=VOCAB)
    srv.start()
    try:
        body = json.dumps({
            "prompt": [1, 2], "max_tokens": 40, "temperature": 1.0,
            "eos": 0,
            "guided_json": {"type": "object",
                            "properties": {"id": {"type": "integer"}},
                            "required": ["id"]},
        }).encode()
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        toks = [t for t in out["tokens"] if t != 0]
        obj = json.loads(_decode(toks))
        assert isinstance(obj["id"], int)
        # missing eos with a guide is a clean 400
        bad = json.dumps({"prompt": [1], "guided_regex": "ab"}).encode()
        req2 = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/completions", data=bad,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req2, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_engine_guided_mla_model():
    """Guided decoding is model-agnostic: the MLA engine (latent INT8
    cache) obeys the grammar too — the mask/transition live at the logits
    layer, not in the model."""
    from piquant_tpu.models import mla as L

    cfg = L.MLAConfig.tiny(vocab=64, dtype=jnp.float32)
    params = L.quantize_params(L.init_params(cfg, jax.random.key(11)),
                               bits=8)
    pat = "(ab|cd){1,5}ef"
    g = TokenGuide.from_regex(pat, VOCAB, eos_id=0)
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                           decode_block=4))
    reqs = [Request(rid=i, prompt=[1 + i, 2], guide=g,
                    sampling=SamplingParams(temperature=0.8 * i,
                                            max_new_tokens=16))
            for i in range(2)]
    for r in reqs:
        eng.submit(r)
    eng.run()
    d = regex_to_dfa(pat)
    for r in reqs:
        txt = _decode(r.tokens[:-1])
        sid = d.walk(d.start, txt)
        assert sid != -1 and d.accepting(sid), (r.rid, txt)


def test_engine_rejects_vocab_mismatch(setup):
    cfg, params = setup
    g = TokenGuide.from_regex("ab", VOCAB + ["extra"], eos_id=0)
    eng = Engine(cfg, params, EngineConfig(batch_slots=1, max_seq_len=64))
    with pytest.raises(ValueError, match="vocab"):
        eng.submit(Request(rid=0, prompt=[1], guide=g))


def test_dfa_fuzz_vs_python_re():
    """Property fuzz: random patterns from the supported subset, random
    strings — the DFA's full-match decision must equal re.fullmatch.
    Deterministic (seeded)."""
    import re

    rng = np.random.default_rng(0xF022)
    alpha = "abc01"

    def rand_atom(depth):
        r = rng.random()
        if depth > 2 or r < 0.45:
            return str(rng.choice(list(alpha)))
        if r < 0.55:
            return "."
        if r < 0.65:
            lo, hi = sorted(rng.choice(list("abc"), 2))
            return f"[{lo}-{hi}]"
        if r < 0.72:
            return "[^a]"
        if r < 0.82:
            return "(" + rand_alt(depth + 1) + ")"
        return "\\d"

    def rand_rep(depth):
        a = rand_atom(depth)
        r = rng.random()
        if r < 0.55:
            return a
        if r < 0.65:
            return a + "*"
        if r < 0.75:
            return a + "+"
        if r < 0.85:
            return a + "?"
        m = int(rng.integers(0, 3))
        n = m + int(rng.integers(0, 3))
        return a + f"{{{m},{n}}}"

    def rand_cat(depth):
        return "".join(rand_rep(depth)
                       for _ in range(int(rng.integers(1, 4))))

    def rand_alt(depth):
        return "|".join(rand_cat(depth)
                        for _ in range(int(rng.integers(1, 3))))

    n_pat, n_str = 60, 40
    checked = 0
    for _ in range(n_pat):
        pat = rand_alt(0)
        try:
            cre = re.compile(pat)
        except re.error:
            continue
        d = regex_to_dfa(pat)
        for _ in range(n_str):
            s = "".join(rng.choice(list(alpha + "z"),
                                   int(rng.integers(0, 7))))
            sid = d.walk(d.start, s)
            got = sid != -1 and d.accepting(sid)
            want = cre.fullmatch(s) is not None
            assert got == want, (pat, s, got, want)
            checked += 1
    assert checked > 1000  # the fuzz actually exercised cases
