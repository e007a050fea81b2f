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


def build_automaton(entries: list[tuple[str, Any]]):
    """Build an automaton from ``(lowercased_pattern, payload)`` pairs.

    First occurrence of a duplicate pattern wins (reference:
    nlp_rule_based.py:244-257 keeps the first payload per lowercase key).
    Uses the C implementation when available, else the pure-Python one.
    """
    auto = _pyahocorasick.Automaton() if _pyahocorasick is not None else Automaton()
    seen: set[str] = set()
    for key, payload in entries:
        if key in seen:
            continue
        seen.add(key)
        auto.add_word(key, payload)
    auto.make_automaton()
    return auto
