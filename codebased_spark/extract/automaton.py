"""Dictionary-matching automata for gazetteer mention scanning.

Two interchangeable implementations of leftmost-longest, non-overlapping,
word-boundary-anchored dictionary matching (the semantics of the reference's
per-document extractors, SURVEY.md §2.2; promised as Aho-Corasick in
SURVEY.md §7.3):

- ``build_trie_regex``: the gazetteer compiled into a prefix-shared trie
  regex. This is the production path: the match loop runs in CPython's
  C regex engine, and because alternatives share prefixes the per-position
  cost is bounded by the trie depth along the matching path — independent
  of the NUMBER of surfaces, which is the property Aho-Corasick exists for.
  Measured (tools/bench_automaton.py): ~40 MB/s/core at 10^3, 10^4 and
  10^5 surfaces alike, vs a flat longest-first alternation (the round-1
  automaton) collapsing from 1.2 MB/s at 10^3 to 0.01 MB/s at 10^5.
- ``AhoCorasick``: the classic goto/fail/output automaton (Aho & Corasick,
  CACM 1975), pure Python. It is the executable specification: tests
  assert it agrees with the trie regex on every input (including a
  hypothesis property test). Its Python match loop is ~1 MB/s/core, so it
  is not the hot path — but it is the ground truth the fast path is
  checked against, and the fallback if a dictionary ever exceeds what
  ``re`` will compile.

Both are cached per gazetteer version at module level, so each executor
builds the automaton once per broadcast gazetteer (the reference's
lru_cache'd tree-sitter language load, treesitter_setup.py:14-47, is the
analogous pattern).
"""

from __future__ import annotations

import re
from collections import deque

__all__ = ["build_trie_regex", "AhoCorasick", "cached_matcher"]


def _build_trie(surfaces) -> dict:
    root: dict = {}
    for s in surfaces:
        node = root
        for ch in s:
            node = node.setdefault(ch, {})
        node[""] = {}  # end-of-word marker
    return root


def _trie_pattern(node: dict) -> str:
    """Regex for one trie node. End-of-word becomes a greedy optional group
    AFTER the continuations, so the engine prefers the longest surface
    starting at a position — leftmost-longest, exactly like a flat
    alternation sorted longest-first (tested equal)."""
    end = "" in node
    alts, cclass = [], []
    for ch in sorted(k for k in node if k != ""):
        sub = _trie_pattern(node[ch])
        if sub == "":
            cclass.append(re.escape(ch))
        else:
            alts.append(re.escape(ch) + sub)
    if not alts and not cclass:
        return ""
    if cclass:
        alts.append(cclass[0] if len(cclass) == 1 else "[" + "".join(cclass) + "]")
    body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
    return "(?:" + body + ")?" if end else body


def build_trie_regex(surfaces) -> re.Pattern:
    """Compile the dictionary into a word-boundary-anchored trie regex."""
    return re.compile(
        r"(?<![\w])(?:" + _trie_pattern(_build_trie(surfaces)) + r")(?![\w])"
    )


class AhoCorasick:
    """Classic Aho-Corasick with finditer-compatible emission semantics.

    ``iter_matches`` yields (start, end) spans: all word-boundary-valid
    occurrences are found via the goto/fail automaton, then reduced to the
    leftmost-longest non-overlapping subset (what ``re.finditer`` emits
    for a longest-first alternation).
    """

    def __init__(self, surfaces):
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        self._fail: list[int] = [0]
        self._lens: list[int] = []
        for s in surfaces:
            if not s:
                continue
            node = 0
            for ch in s:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    self._fail.append(0)
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            self._out[node].append(len(self._lens))
            self._lens.append(len(s))
        # BFS failure links; merge output sets down the fail chain
        q = deque(self._goto[0].values())
        while q:
            node = q.popleft()
            for ch, nxt in self._goto[node].items():
                q.append(nxt)
                f = self._fail[node]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[nxt] = self._goto[f].get(ch, 0) if self._goto[f].get(ch, 0) != nxt else 0
                self._out[nxt] = self._out[nxt] + self._out[self._fail[nxt]]

    def _occurrences(self, text: str):
        """Every dictionary occurrence (start, end), overlapping included."""
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self._goto[node]:
                node = self._fail[node]
            node = self._goto[node].get(ch, 0)
            for surf_idx in self._out[node]:
                ln = self._lens[surf_idx]
                yield (i - ln + 1, i + 1)

    @staticmethod
    def _word(ch: str) -> bool:
        return ch.isalnum() or ch == "_"

    def iter_matches(self, text: str):
        """Leftmost-longest non-overlapping word-boundary matches."""
        valid = [
            (s, e)
            for s, e in self._occurrences(text)
            if (s == 0 or not self._word(text[s - 1]))
            and (e == len(text) or not self._word(text[e]))
        ]
        valid.sort(key=lambda t: (t[0], -t[1]))
        cur = 0
        for s, e in valid:
            if s >= cur:
                yield (s, e)
                cur = e


_MATCHER_CACHE: dict[int, re.Pattern] = {}


def cached_matcher(surfaces: tuple[str, ...]) -> re.Pattern:
    """Per-process (per-executor) compiled trie regex for this gazetteer."""
    key = hash(surfaces)
    pat = _MATCHER_CACHE.get(key)
    if pat is None:
        pat = _MATCHER_CACHE[key] = build_trie_regex(surfaces)
    return pat
