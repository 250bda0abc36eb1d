"""HTTP serving front-end (serving/server.py): completions parity with the
direct engine, concurrent clients sharing a batch, SSE streaming, errors."""

import json
import threading
import urllib.request

import jax
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.serving import Engine, EngineConfig, Request, SamplingParams
from piquant_tpu.serving.server import EngineServer

SEED = 0x9032002


@pytest.fixture(scope="module")
def setup():
    cfg = M.LlamaConfig.tiny()
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED)),
                               bits=4)
    return cfg, params


@pytest.fixture()
def server(setup):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                           decode_block=4))
    srv = EngineServer(eng)
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body, timeout=180):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/v1/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _direct(setup, prompts, n_new):
    cfg, params = setup
    eng = Engine(cfg, params, EngineConfig(batch_slots=2, max_seq_len=64,
                                           decode_block=4))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=list(p),
                           sampling=SamplingParams(max_new_tokens=n_new)))
    return {tuple(prompts[r.rid]): r.tokens for r in eng.run()}


def test_completions_matches_direct_engine(setup, server):
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    want = _direct(setup, prompts, 6)

    results = {}
    def post_one(p):
        code, out = _post(server, {"prompt": p, "max_tokens": 6})
        assert code == 200 and out["done"]
        results[tuple(p)] = out["tokens"]

    threads = [threading.Thread(target=post_one, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results == want, (results, want)


def test_streaming_sse(setup, server):
    want = _direct(setup, [[4, 4, 4]], 5)[(4, 4, 4)]
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/v1/completions",
        data=json.dumps({"prompt": [4, 4, 4], "max_tokens": 5,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    toks = []
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            toks.append(json.loads(payload)["token"])
    assert toks == want, (toks, want)


def test_metrics_and_health(server):
    with urllib.request.urlopen(
            f"http://{server.host}:{server.port}/health", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}
    with urllib.request.urlopen(
            f"http://{server.host}:{server.port}/v1/metrics",
            timeout=30) as r:
        m = json.loads(r.read())
    assert "decode_tokens" in m and "prefix_hits" in m


def test_bad_request_rejected(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, {"prompt": "not token ids"})
    assert ei.value.code == 400


# ---------------------------------------------------------------------------
# CLI (__main__) regression coverage
# ---------------------------------------------------------------------------

def test_cli_mlp_overrides_helper():
    """Regression: the CLI referenced _mlp_overrides without defining it —
    every non-preset quantize path (incl. `--random tiny`) crashed with
    NameError since the mixed-precision flags landed."""
    from piquant_tpu.serving.__main__ import _mlp_overrides, build_parser

    ap = build_parser()
    a = ap.parse_args(["--random", "tiny"])
    assert _mlp_overrides(a) is None
    a = ap.parse_args(["--random", "tiny", "--mlp-bits", "2",
                       "--mlp-group-size", "32"])
    assert _mlp_overrides(a) == {"w1": (2, 32), "w3": (2, 32), "w2": (2, 32)}
    a = ap.parse_args(["--random", "tiny", "--bits", "4",
                       "--mlp-group-size", "64"])
    assert _mlp_overrides(a) == {"w1": (4, 64), "w3": (4, 64), "w2": (4, 64)}


def test_cli_benchmark_tiny_smoke(capsys):
    """End-to-end CLI run on the tiny preset (the path the NameError
    broke): benchmark mode prints a metrics JSON line."""
    import json as _json

    from piquant_tpu.serving.__main__ import main

    rc = main(["--random", "tiny", "--benchmark", "2", "--max-seq-len", "128",
               "--slots", "2", "--max-new", "4", "--mlp-bits", "4"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    m = _json.loads(line)
    assert m["completed"] == 2 and m["decode_tokens"] > 0
