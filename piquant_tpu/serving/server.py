"""HTTP serving front-end: an OpenAI-style completions endpoint over the
continuous-batching engine.

The reference stops at the tensor quantizer; this is the production
serving surface the BASELINE configs point at (SURVEY §2.3 serving slice).
Token-level API (bring your own tokenizer — no tokenizer dependency in the
core): POST token ids, stream token ids back.

    srv = EngineServer(engine)          # binds 127.0.0.1:<ephemeral>
    srv.start()
    ... POST http://127.0.0.1:{srv.port}/v1/completions
        {"prompt": [1,2,3], "max_tokens": 16, "temperature": 0.0,
         "stream": false}
    srv.stop()

Endpoints:
    POST /v1/completions   -> {"id", "tokens", "logprobs", "done"} or
                              SSE chunks `data: {"token": t, ...}` with a
                              final `data: [DONE]` when "stream": true
                              Optional structured output: "guided_regex"
                              or "guided_json" (a JSON schema) + "eos"
                              constrain generation to the grammar
                              (serving/guided.py; needs a server vocab)
    GET  /v1/metrics       -> EngineMetrics.to_dict()
    GET  /health           -> {"ok": true}

Concurrency model: ONE engine worker thread owns the device (the engine's
jitted programs are not thread-safe); HTTP handler threads only enqueue
requests and block on per-request token queues.  Requests arriving while a
batch is decoding join it at the next scheduler tick (continuous
batching), so concurrent clients share the chip.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from piquant_tpu.serving.engine import Engine, Request
from piquant_tpu.serving.sampler import SamplingParams

__all__ = ["EngineServer"]

_SENTINEL = object()


class EngineServer:
    def __init__(self, engine: Engine, host: str = "127.0.0.1",
                 port: int = 0, vocab=None, max_guides: int = 8):
        """`vocab` (optional): token id -> decoded string list; enables the
        guided-decoding request fields (`guided_regex` / `guided_json` +
        `eos`).  Compiled TokenGuides are cached per (pattern, eos) in an
        LRU of `max_guides` entries — requests are untrusted, and every
        DISTINCT pattern costs a DFA compile plus rows in the engine's
        combined device table (which itself is bounded by
        EngineConfig.max_guide_states)."""
        self.engine = engine
        self.vocab = vocab
        self.max_guides = max_guides
        from collections import OrderedDict

        self._guide_cache: "OrderedDict" = OrderedDict()
        self._inbox: "queue.Queue" = queue.Queue()
        self._sinks: dict = {}
        self._cursor: dict = {}
        self._rid = 0
        self._rid_lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None

        server = self

        class Handler(BaseHTTPRequestHandler):
            daemon_threads = True

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    return self._json(200, {"ok": True})
                if self.path == "/v1/metrics":
                    return self._json(200, server.engine.metrics.to_dict())
                return self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/completions":
                    return self._json(404, {"error": "not found"})
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    prompt = body["prompt"]
                    if (not isinstance(prompt, list)
                            or not all(isinstance(t, int) for t in prompt)):
                        raise ValueError("prompt must be a list of token ids")
                    sp = SamplingParams(
                        max_new_tokens=int(body.get("max_tokens", 16)),
                        temperature=float(body.get("temperature", 0.0)),
                        top_k=int(body.get("top_k", 0) or 0),
                        top_p=float(body.get("top_p", 1.0)),
                        min_p=float(body.get("min_p", 0.0)),
                        stop_tokens=tuple(body.get("stop", ()) or ()),
                        stop_sequences=tuple(
                            tuple(int(t) for t in s)
                            for s in body.get("stop_sequences", ()) or ()),
                        min_new_tokens=int(body.get("min_tokens", 0)),
                        eos_token=int(body.get("eos", -1)),
                        repetition_penalty=float(
                            body.get("repetition_penalty", 1.0)),
                        frequency_penalty=float(
                            body.get("frequency_penalty", 0.0)),
                        presence_penalty=float(
                            body.get("presence_penalty", 0.0)),
                        logit_bias=tuple(
                            (int(k), float(v)) for k, v in
                            dict(body.get("logit_bias", {})).items()),
                    )
                    guide = server._resolve_guide(body)
                    adapter = int(body.get("adapter", 0))
                except (KeyError, TypeError, ValueError) as e:
                    return self._json(400, {"error": str(e)})

                rid, sink = server._enqueue(prompt, sp, guide, adapter)
                if body.get("stream"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    while True:
                        item = sink.get()
                        if item is _SENTINEL:
                            self.wfile.write(b"data: [DONE]\n\n")
                            self.wfile.flush()
                            return
                        tok, lp = item
                        self.wfile.write(
                            b"data: " + json.dumps(
                                {"id": rid, "token": tok, "logprob": lp}
                            ).encode() + b"\n\n")
                        self.wfile.flush()
                else:
                    toks, lps = [], []
                    while True:
                        item = sink.get()
                        if item is _SENTINEL:
                            break
                        toks.append(item[0])
                        lps.append(item[1])
                    self._json(200, {"id": rid, "tokens": toks,
                                     "logprobs": lps, "done": True})

            def _json(self, code, obj):
                payload = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]

    # ------------------------------------------------------------------
    def _resolve_guide(self, body):
        """`guided_regex` / `guided_json` (+ required `eos`) -> TokenGuide,
        cached per (pattern, eos) — DFA compilation is one-time."""
        rx = body.get("guided_regex")
        js = body.get("guided_json")
        if rx is None and js is None:
            return None
        if self.vocab is None:
            raise ValueError("guided decoding needs a server-side vocab "
                             "(EngineServer(..., vocab=id->str list))")
        eos = int(body.get("eos", -1))
        if eos < 0:
            raise ValueError("guided decoding needs an explicit `eos` "
                             "token id (terminates a complete match)")
        from piquant_tpu.serving.guided import TokenGuide, json_schema_regex

        if rx is None:
            rx = json_schema_regex(js)
        key = (rx, eos)
        if key in self._guide_cache:
            self._guide_cache.move_to_end(key)
            return self._guide_cache[key]
        if len(self._guide_cache) >= self.max_guides:
            # NOTE: evicting here only bounds HOST compiles; the engine's
            # combined device table is append-only and enforces its own
            # max_guide_states ceiling with a clean error
            self._guide_cache.popitem(last=False)
        guide = TokenGuide.from_regex(rx, self.vocab, eos_id=eos)
        self._guide_cache[key] = guide
        return guide

    def _enqueue(self, prompt, sp, guide=None, adapter=0) -> tuple:
        with self._rid_lock:
            self._rid += 1
            rid = self._rid
        sink: "queue.Queue" = queue.Queue()
        self._inbox.put((Request(rid=rid, prompt=list(prompt), sampling=sp,
                                 guide=guide, adapter_id=adapter), sink))
        self._wake.set()
        return rid, sink

    def _drain_inbox(self) -> bool:
        got = False
        while True:
            try:
                req, sink = self._inbox.get_nowait()
            except queue.Empty:
                return got
            self._sinks[req.rid] = sink
            self.engine.submit(req)
            got = True

    def _deliver(self, r) -> None:
        """Sync a request's sink from r.tokens via a per-rid cursor.

        run_stream() yields are used only as PROGRESS SIGNALS: the
        admission-time first token is never yielded, and r.done is already
        True on every yield of a request's final block — reading the
        authoritative r.tokens/r.logprobs avoids both traps."""
        sink = self._sinks.get(r.rid)
        if sink is None:
            return
        i = self._cursor.get(r.rid, 0)
        while i < len(r.tokens):
            sink.put((r.tokens[i],
                      r.logprobs[i] if i < len(r.logprobs) else None))
            i += 1
        self._cursor[r.rid] = i
        if r.done:
            sink.put(_SENTINEL)
            self._sinks.pop(r.rid, None)
            self._cursor.pop(r.rid, None)

    def _worker_loop(self):
        eng = self.engine
        while not self._stop.is_set():
            if not self._drain_inbox():
                self._wake.wait(0.05)
                self._wake.clear()
                continue
            for r, _tok in eng.run_stream():
                self._deliver(r)
                # new arrivals join the live batch (continuous batching)
                self._drain_inbox()
                if self._stop.is_set():
                    break
            # generator drained: flush sinks whose requests finished without
            # a final yield (e.g. cancel, EOS at admission)
            for rid in list(self._sinks):
                req = next((x for x in eng._all if x.rid == rid), None)
                if req is not None and req.done:
                    self._deliver(req)

    # ------------------------------------------------------------------
    def start(self) -> None:
        self._worker = threading.Thread(target=self._worker_loop,
                                        daemon=True)
        self._worker.start()
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._http_thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._worker is not None:
            self._worker.join(timeout=10)
