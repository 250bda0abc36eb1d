"""Guided (constrained) decoding: regex / JSON-schema → DFA → token tables.

Serving-side structured generation (the vLLM/outlines feature class, built
TPU-first): a grammar is compiled AHEAD OF TIME into two dense device
arrays —

    mask  [S, V] bool   — token t may be emitted from DFA state s
    trans [S, V] int32  — the state after emitting t from s

and the jitted decode scan carries one int32 state per slot: per step it
gathers `mask[state]` to -inf the disallowed logits before sampling and
advances `state = trans[state, tok]` after.  No host round-trip, no
per-step Python — the grammar costs two VMEM gathers per token, so guided
slots decode at the same tok/s as free slots (engine.py integration).

Pipeline (all host-side, one-time per grammar):
  1. regex subset → AST → Thompson NFA (`_parse`, `_Nfa`)
  2. lazy subset-construction DFA over characters (`_Dfa`)
  3. token-level closure: walk every vocab token's characters from every
     reachable DFA state (`TokenGuide.build`) — a token is allowed iff the
     walk stays alive; EOS is allowed exactly in accepting states.

Regex subset: literals, `.`, escapes (\\d \\w \\s \\D \\W \\S and literal
escapes), classes `[a-z0-9_]` / negated `[^"]`, groups, alternation,
quantifiers `* + ? {m} {m,n} {m,}`.  Patterns are fully anchored (the
whole generation must match), matching the structured-output use case.

JSON mode: `json_schema_regex(schema)` lowers a JSON-Schema subset
(object/properties, string, integer, number, boolean, null, enum, array)
to a canonical-whitespace regex, so `TokenGuide.from_json_schema(...)`
guarantees parseable JSON of the requested shape.

Reference anchor: pi-quant has no serving layer; this extends the
serving stack like engine.py itself does (SURVEY §2 extension surface).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["TokenGuide", "json_schema_regex", "regex_to_dfa"]


# ---------------------------------------------------------------------------
# character sets
# ---------------------------------------------------------------------------

_D = frozenset("0123456789")
_W = _D | frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_S = frozenset(" \t\n\r\f\v")


@dataclasses.dataclass(frozen=True)
class _CharSet:
    chars: frozenset
    negated: bool = False

    def contains(self, ch: str) -> bool:
        return (ch not in self.chars) if self.negated else (ch in self.chars)


_DOT = _CharSet(frozenset("\n"), negated=True)


# ---------------------------------------------------------------------------
# regex parser → AST
# ---------------------------------------------------------------------------
# AST nodes: ("char", _CharSet) | ("cat", [..]) | ("alt", [..])
#            | ("star", node) | ("plus", node) | ("opt", node)

class _Parser:
    def __init__(self, pat: str):
        self.p = pat
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i} "
                             f"in regex {self.p!r}")
        return node

    def _alt(self):
        parts = [self._cat()]
        while self.peek() == "|":
            self.take()
            parts.append(self._cat())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def _cat(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            parts.append(self._rep())
        if not parts:
            return ("cat", [])
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def _rep(self):
        node = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.take()
                node = ("star", node)
            elif ch == "+":
                self.take()
                node = ("plus", node)
            elif ch == "?":
                self.take()
                node = ("opt", node)
            elif ch == "{":
                node = self._bounded(node)
            else:
                return node

    def _bounded(self, node):
        self.take()  # '{'
        spec = ""
        while self.peek() not in (None, "}"):
            spec += self.take()
        if self.peek() != "}":
            raise ValueError("unterminated {m,n}")
        self.take()
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s)
            hi = int(hi_s) if hi_s else None
        else:
            lo = hi = int(spec)
        # expand at the AST level: m copies + (n-m) optionals / a star tail
        parts = [node] * lo
        if hi is None:
            parts.append(("star", node))
        else:
            if hi < lo:
                raise ValueError(f"bad bound {{{spec}}}")
            parts.extend(("opt", node) for _ in range(hi - lo))
        return ("cat", parts)

    def _atom(self):
        ch = self.take()
        if ch == "(":
            node = self._alt()
            if self.peek() != ")":
                raise ValueError("unbalanced (")
            self.take()
            return node
        if ch == "[":
            return ("char", self._cls())
        if ch == ".":
            return ("char", _DOT)
        if ch == "\\":
            return ("char", self._escape(self.take()))
        if ch in "*+?{":
            raise ValueError(f"dangling quantifier {ch!r}")
        return ("char", _CharSet(frozenset(ch)))

    def _escape(self, e: str) -> _CharSet:
        table = {"d": _CharSet(_D), "D": _CharSet(_D, True),
                 "w": _CharSet(_W), "W": _CharSet(_W, True),
                 "s": _CharSet(_S), "S": _CharSet(_S, True),
                 "n": _CharSet(frozenset("\n")),
                 "t": _CharSet(frozenset("\t")),
                 "r": _CharSet(frozenset("\r"))}
        return table.get(e, _CharSet(frozenset(e)))

    def _cls(self) -> _CharSet:
        negated = False
        if self.peek() == "^":
            self.take()
            negated = True
        chars = set()
        prev = None
        while self.peek() not in (None, "]"):
            ch = self.take()
            if ch == "\\":
                sub = self._escape(self.take())
                if sub.negated:
                    raise ValueError("negated escape inside class")
                chars |= sub.chars
                prev = None
                continue
            if ch == "-" and prev is not None and self.peek() not in (None, "]"):
                hi = self.take()
                chars |= {chr(c) for c in range(ord(prev), ord(hi) + 1)}
                prev = None
                continue
            chars.add(ch)
            prev = ch
        if self.peek() != "]":
            raise ValueError("unterminated [")
        self.take()
        return _CharSet(frozenset(chars), negated)


# ---------------------------------------------------------------------------
# Thompson NFA + lazy subset-construction DFA
# ---------------------------------------------------------------------------

class _Nfa:
    """ε-NFA: states 0..n-1, eps[s] = [s'], edges[s] = [(_CharSet, s')]."""

    def __init__(self, ast):
        self.eps: List[List[int]] = []
        self.edges: List[List[Tuple[_CharSet, int]]] = []
        self.start, self.accept = self._build(ast)

    def _new(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def _build(self, node) -> Tuple[int, int]:
        kind = node[0]
        if kind == "char":
            a, b = self._new(), self._new()
            self.edges[a].append((node[1], b))
            return a, b
        if kind == "cat":
            if not node[1]:
                a = self._new()
                return a, a
            s, e = self._build(node[1][0])
            for sub in node[1][1:]:
                s2, e2 = self._build(sub)
                self.eps[e].append(s2)
                e = e2
            return s, e
        if kind == "alt":
            a, b = self._new(), self._new()
            for sub in node[1]:
                s, e = self._build(sub)
                self.eps[a].append(s)
                self.eps[e].append(b)
            return a, b
        if kind in ("star", "plus", "opt"):
            s, e = self._build(node[1])
            a, b = self._new(), self._new()
            self.eps[a].append(s)
            if kind != "plus":
                self.eps[a].append(b)
            if kind != "opt":
                self.eps[e].append(s)
            self.eps[e].append(b)
            return a, b
        raise AssertionError(kind)

    def closure(self, states) -> frozenset:
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)


class _Dfa:
    """Lazy DFA over characters: states are interned NFA-closure sets;
    transitions are discovered on demand and memoized (the alphabet is
    whatever characters the vocab contains — never enumerated)."""

    DEAD = -1

    def __init__(self, pat: str):
        self.nfa = _Nfa(_Parser(pat).parse())
        self._ids: Dict[frozenset, int] = {}
        self._sets: List[frozenset] = []
        self._memo: Dict[Tuple[int, str], int] = {}
        self.start = self._intern(self.nfa.closure([self.nfa.start]))

    def _intern(self, s: frozenset) -> int:
        if s not in self._ids:
            self._ids[s] = len(self._sets)
            self._sets.append(s)
        return self._ids[s]

    def step(self, sid: int, ch: str) -> int:
        key = (sid, ch)
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        nxt = set()
        for s in self._sets[sid]:
            for cs, dst in self.nfa.edges[s]:
                if cs.contains(ch):
                    nxt.add(dst)
        out = self._intern(self.nfa.closure(nxt)) if nxt else self.DEAD
        self._memo[key] = out
        return out

    def accepting(self, sid: int) -> bool:
        return self.nfa.accept in self._sets[sid]

    def walk(self, sid: int, text: str) -> int:
        for ch in text:
            sid = self.step(sid, ch)
            if sid == self.DEAD:
                return self.DEAD
        return sid


def regex_to_dfa(pattern: str) -> _Dfa:
    """Compile the regex subset to a lazy DFA (exposed for tests/tools)."""
    return _Dfa(pattern)


# ---------------------------------------------------------------------------
# token-level guide
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TokenGuide:
    """Dense token-level automaton for one grammar over one vocab.

    mask[s, t]  — emitting token t from state s keeps the match alive
    trans[s, t] — resulting state (0 where masked; never read there)
    accept[s]   — the text consumed so far is a complete match
    EOS is allowed exactly at accepting states (trans: self-loop).
    Dead-end pruning (from_regex) guarantees every reachable state allows
    at least one token or EOS — `check_complete()` asserts that invariant
    for tables built/edited by hand.
    """

    mask: np.ndarray      # [S, V] bool
    trans: np.ndarray     # [S, V] int32
    accept: np.ndarray    # [S] bool
    eos_id: int
    pattern: str = ""

    # identity-hashable: engine table stacking keys on the object
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def n_states(self) -> int:
        return self.mask.shape[0]

    @property
    def vocab_size(self) -> int:
        return self.mask.shape[1]

    @classmethod
    def from_regex(cls, pattern: str, vocab: Sequence[str], eos_id: int,
                   max_states: int = 4096) -> "TokenGuide":
        """vocab: token id -> decoded string (e.g.
        `tok.convert_ids_to_tokens` post-processed, or any id->str map).
        Walks every token's characters from every reachable state —
        O(S · sum(len(t))) one-time host cost."""
        dfa = _Dfa(pattern)
        v = len(vocab)
        ids = {dfa.start: 0}
        order = [dfa.start]
        rows_mask: List[np.ndarray] = []
        rows_trans: List[np.ndarray] = []
        qi = 0
        while qi < len(order):
            sid = order[qi]
            qi += 1
            m = np.zeros((v,), bool)
            t = np.zeros((v,), np.int32)
            for tid, text in enumerate(vocab):
                if tid == eos_id or not text:
                    continue  # EOS handled below; empty tokens make no
                              # progress (infinite-loop risk) — disallowed
                end = dfa.walk(sid, text)
                if end == _Dfa.DEAD:
                    continue
                if end not in ids:
                    if len(ids) >= max_states:
                        raise ValueError(
                            f"guide exceeds max_states={max_states} "
                            f"(pattern {pattern!r})")
                    ids[end] = len(order)
                    order.append(end)
                m[tid] = True
                t[tid] = ids[end]
            rows_mask.append(m)
            rows_trans.append(t)
        s = len(order)
        mask = np.stack(rows_mask)
        trans = np.stack(rows_trans)
        accept = np.asarray([dfa.accepting(sid) for sid in order])
        # remap trans targets to final ids (they already are: ids assigned
        # in discovery order == row order)
        # dead-end pruning: only allow a token if its TARGET state can still
        # reach acceptance through the token graph (a char-level-alive state
        # can be a tokenizer dead-end — e.g. the grammar needs a lone "d"
        # the vocab only carries inside "cd").  Fixpoint over winning
        # states; without this, generation could get cornered into a state
        # where nothing (not even EOS) is valid.
        winning = accept.copy()
        while True:
            nxt = accept | (mask & winning[trans]).any(axis=1)
            if (nxt == winning).all():
                break
            winning = nxt
        if not winning[0]:
            raise ValueError(
                f"grammar {pattern!r} is unsatisfiable under this vocab "
                "(no token path from the start state to acceptance)")
        mask &= winning[trans]
        if 0 <= eos_id < v:
            mask[:, eos_id] = accept
            trans[:, eos_id] = np.arange(s, dtype=np.int32)
        return cls(mask=mask, trans=trans, accept=accept, eos_id=eos_id,
                   pattern=pattern)

    @classmethod
    def from_json_schema(cls, schema, vocab: Sequence[str], eos_id: int,
                         max_states: int = 4096) -> "TokenGuide":
        return cls.from_regex(json_schema_regex(schema), vocab, eos_id,
                              max_states)

    def check_complete(self) -> None:
        """Assert the no-stuck-state invariant (every state allows a token
        or EOS) — from_regex guarantees it via dead-end pruning; call this
        on hand-built/edited tables before serving them."""
        stuck = ~self.mask.any(axis=1)
        if stuck.any():
            raise ValueError(
                f"guide has stuck states (no token, not accepting): rows "
                f"{np.flatnonzero(stuck).tolist()[:8]}")

    def check(self, token_ids: Sequence[int]) -> bool:
        """Host-side oracle: does this exact token sequence (without EOS)
        end in an accepting state?  (Tests / request validation.)"""
        s = 0
        for t in token_ids:
            if not self.mask[s, t] or t == self.eos_id:
                return False
            s = int(self.trans[s, t])
        return bool(self.accept[s])


# ---------------------------------------------------------------------------
# JSON-Schema subset → regex
# ---------------------------------------------------------------------------

_META = set("\\^$.|?*+()[]{}")


def _lit(text: str) -> str:
    return "".join("\\" + c if c in _META else c for c in text)


_NUM_INT = "(0|-?[1-9][0-9]{0,15}|-0)"
_NUM = _NUM_INT + "(\\.[0-9]{1,10})?([eE][+-]?[0-9]{1,3})?"
_STR = '"[^"\\\\]{0,60}"'


def json_schema_regex(schema) -> str:
    """Lower a JSON-Schema subset to a fully-anchored regex with canonical
    whitespace (none): object (properties in declaration order, all
    emitted; non-required ones optional only when trailing), string,
    integer, number, boolean, null, enum (JSON-literal alternatives),
    array (minItems/maxItems up to a small bound).  String/number lengths
    are bounded so the DFA stays small."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _schema_rx(schema)


def _schema_rx(sc) -> str:
    if "enum" in sc:
        return "(" + "|".join(
            _lit(json.dumps(v, separators=(",", ":"))) for v in sc["enum"]
        ) + ")"
    t = sc.get("type")
    if t == "string":
        pat = sc.get("pattern")
        if pat is not None:
            return '"' + pat + '"'
        return _STR
    if t == "integer":
        return _NUM_INT
    if t == "number":
        return _NUM
    if t == "boolean":
        return "(true|false)"
    if t == "null":
        return "null"
    if t == "array":
        item = _schema_rx(sc.get("items", {"type": "number"}))
        lo = int(sc.get("minItems", 0))
        hi = int(sc.get("maxItems", 8))
        if hi < max(lo, 1):
            raise ValueError("maxItems too small")
        body = f"({item}(,{item}){{{max(lo - 1, 0)},{hi - 1}}})"
        if lo == 0:
            body += "?"
        return "\\[" + body + "\\]"
    if t == "object":
        props = sc.get("properties", {})
        required = set(sc.get("required", props.keys()))
        keys = list(props)
        pieces = {k: _lit(json.dumps(k)) + ":" + _schema_rx(props[k])
                  for k in keys}
        opt = [k not in required for k in keys]
        if any(o and not all(opt[i:]) for i, o in enumerate(opt)):
            raise ValueError(
                "optional properties must form a trailing suffix "
                "(canonical key order; emit optional keys last)")
        n_req = opt.index(True) if any(opt) else len(keys)
        body = ",".join(pieces[k] for k in keys[:n_req])
        # trailing optionals as a nested suffix chain: a later optional key
        # may appear only if the earlier ones do (the unambiguous-comma
        # canonical form; full presence-subset alternation is exponential)
        suffix = ""
        for j in range(len(keys) - 1, n_req - 1, -1):
            sep = "," if (n_req > 0 or j > n_req) else ""
            suffix = "(" + sep + pieces[keys[j]] + suffix + ")?"
        return "\\{" + body + suffix + "\\}"
    raise ValueError(f"unsupported schema: {sc!r}")
