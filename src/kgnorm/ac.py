"""Multi-pattern dictionary matcher (Aho-Corasick).

The reference engine's "table scan" is an Aho-Corasick automaton over all
lowercased vocabulary synonyms (reference: backend/app/services/
nlp_rule_based.py:224-266, scan :309-319).  It relies on the
``pyahocorasick`` C extension; this module provides the same match
semantics in pure Python so the engine has no native dependency, and
transparently upgrades to ``pyahocorasick`` when that package is
importable (it is API-compatible and ~20x faster — ship it via
``--py-files``/cluster image in production).

Match semantics required for parity:

* every occurrence of every pattern is emitted, including overlapping
  matches and patterns nested inside longer matches (the reference keeps
  all boundary-valid spans and only drops exact ``(start, end)``
  duplicates — do not "optimize" to leftmost-longest);
* matches are emitted in ascending end-position order.

The automaton is built once on the Spark driver from the broadcast
dictionary and rebuilt lazily (and cached) inside each executor Python
worker — see :mod:`kgnorm.extract`.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Iterator

try:  # optional C-accelerated implementation
    import ahocorasick as _pyahocorasick  # type: ignore
except ImportError:  # pragma: no cover - depends on environment
    _pyahocorasick = None


class Automaton:
    """Pure-Python Aho-Corasick automaton.

    ``add_word(key, payload)`` then ``make_automaton()`` then
    ``iter(haystack)`` yielding ``(end_index, payload)`` with
    ``end_index`` the *inclusive* index of the match's last character —
    the same contract as ``pyahocorasick.Automaton``.
    """

    __slots__ = ("_goto", "_fail", "_out", "_payload", "_built")

    def __init__(self) -> None:
        # state 0 is the root; _goto[state] is a dict: char -> state
        self._goto: list[dict[str, int]] = [{}]
        self._payload: dict[int, Any] = {}
        self._fail: list[int] = [0]
        self._out: list[list[int]] = [[]]  # terminal states reachable via fail links
        self._built = False

    def add_word(self, key: str, payload: Any) -> None:
        if self._built:
            raise RuntimeError("automaton already finalized")
        state = 0
        for ch in key:
            nxt = self._goto[state].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                state_dict = self._goto[state]
                state_dict[ch] = nxt
            state = nxt
        self._payload[state] = payload

    def make_automaton(self) -> None:
        """Compute failure links and per-state output lists (BFS)."""
        n = len(self._goto)
        self._fail = [0] * n
        self._out = [[] for _ in range(n)]
        queue: deque[int] = deque()
        for state in self._goto[0].values():
            queue.append(state)
        while queue:
            state = queue.popleft()
            if state in self._payload:
                self._out[state].append(state)
            # inherit suffix outputs from the fail target
            self._out[state].extend(self._out[self._fail[state]])
            for ch, nxt in self._goto[state].items():
                queue.append(nxt)
                f = self._fail[state]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[nxt] = self._goto[f].get(ch, 0)
                if self._fail[nxt] == nxt:  # direct child of root
                    self._fail[nxt] = 0
        self._built = True

    def iter(self, haystack: str) -> Iterator[tuple[int, Any]]:
        """Yield ``(inclusive_end_index, payload)`` for every match."""
        if not self._built:
            raise RuntimeError("call make_automaton() first")
        goto = self._goto
        fail = self._fail
        out = self._out
        payload = self._payload
        state = 0
        for i, ch in enumerate(haystack):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for terminal in out[state]:
                    yield i, payload[terminal]


class RegexTrieMatcher:
    """Dictionary matcher backed by one compiled trie regex.

    Same ``iter`` contract and match SET as :class:`Automaton` /
    pyahocorasick, built for multi-core cache behavior: the pure-Python
    automaton's per-process node graph (~MBs of dicts) thrashes the
    shared L3 once tens of workers run concurrently, while a compiled
    trie regex is ~100 KB of ``sre`` bytecode scanned by the C engine.

    Construction: a zero-width lookahead around a greedy trie pattern
    ``(?=(<trie>))`` captures, at every start position, the LONGEST
    dictionary term beginning there (terminal alternatives are ordered
    after child descent).  All other terms matching at that position are
    exactly the dictionary terms that are PREFIXES of the captured one
    (two matches at one position are both prefixes of the text, hence
    one is a prefix of the other), so a prefix-expansion table restores
    the full overlapping match set, shortest first — which reproduces
    pyahocorasick's end-ascending order after the caller's stable
    sort-by-start (equivalence asserted in tests/test_ac.py).
    """

    __slots__ = ("_rx", "_expand")

    def __init__(self, entries: list[tuple[str, Any]]) -> None:
        payloads: dict[str, Any] = {}
        for key, payload in entries:
            if key and key not in payloads:
                payloads[key] = payload

        # trie of term characters
        trie: dict = {}
        for term in payloads:
            node = trie
            for ch in term:
                node = node.setdefault(ch, {})
            node[""] = True  # terminal marker

        import re as _re

        def emit(node: dict) -> str:
            keys = [k for k in node if k != ""]
            alts = []
            for ch in sorted(keys):
                sub = emit(node[ch])
                alts.append(_re.escape(ch) + sub)
            body = ""
            if len(alts) == 1:
                body = alts[0]
            elif alts:
                body = "(?:" + "|".join(alts) + ")"
            if "" in node:
                # terminal: prefer descending deeper (longest match first)
                return "(?:" + body + ")?" if body else ""
            return body

        self._rx = _re.compile(r"(?=(" + emit(trie) + r"))")

        # term -> [(len, payload) for every dictionary prefix of term], shortest first
        self._expand = {}
        for term, payload in payloads.items():
            pre = [
                (l, payloads[term[:l]])
                for l in range(1, len(term) + 1)
                if term[:l] in payloads
            ]
            self._expand[term] = pre

    def iter(self, haystack: str):
        expand = self._expand
        for m in self._rx.finditer(haystack):
            start = m.start()
            for length, payload in expand[m.group(1)]:
                yield start + length - 1, payload


def build_automaton(entries: list[tuple[str, Any]], impl: str | None = None):
    """Build a dictionary matcher from ``(lowercased_pattern, payload)`` pairs.

    First occurrence of a duplicate pattern wins (reference:
    nlp_rule_based.py:244-257 keeps the first payload per lowercase key).

    ``impl``: 'ahocorasick' (C extension), 'pure' (pure-Python AC),
    'regex' (compiled trie regex — default when the C extension is
    missing; best multi-worker cache behavior).
    """
    import os

    impl = impl or os.environ.get("KGNORM_MATCHER") or (
        "ahocorasick" if _pyahocorasick is not None else "regex"
    )
    if impl == "regex":
        return RegexTrieMatcher(entries)
    auto = _pyahocorasick.Automaton() if impl == "ahocorasick" and _pyahocorasick is not None else Automaton()
    seen: set[str] = set()
    for key, payload in entries:
        if key in seen:
            continue
        seen.add(key)
        auto.add_word(key, payload)
    auto.make_automaton()
    return auto
