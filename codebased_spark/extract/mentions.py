"""Gazetteer mention detection + pattern-based open triple extraction.

Reference analog: the per-document extractors (SURVEY.md §2.2) — a parser
walks one document and emits typed entities plus `unresolved:` relationship
rows (python.py:380-396 call-site emit is the open-triple pattern). Here the
"parser" is a dictionary automaton over web text:

- The gazetteer (surface_form → canonical_id) is broadcast via
  ``sc.broadcast`` (one torrent transfer per executor, not one closure copy
  per task); each executor compiles ONE matching automaton per gazetteer
  version (lazy module-level cache — the lru_cache'd tree-sitter language
  load of the reference, treesitter_setup.py:14-47, is the same pattern).
- The automaton is a prefix-shared trie regex (extract/automaton.py):
  Aho-Corasick leftmost-longest word-boundary semantics with the match loop
  in C, and per-position cost independent of gazetteer SIZE (~40 MB/s/core
  at 10^5 surfaces; the round-1 flat alternation fell to 0.01 MB/s there).
  The classic goto/fail AhoCorasick class in the same module is the
  executable spec the trie regex is property-tested against.
- Relation triples: for consecutive mention pairs, the gap text is looked up
  in a verb-phrase table ("{A} works for {B}" → WORKS_FOR) — the analog of
  the reference's AST-node→relationship tables (javascript.py:25-46).
- Unmatched capitalized sequences are emitted as *candidate* mentions for
  the fuzzy linker (reference's suffix fuzzy-match fallback,
  extractor.py:386-390, upgraded to TF-IDF char-ngram scoring in link/).

All of this runs inside ONE Arrow-batched pandas UDF returning struct arrays
that Spark explodes — one pass over the text per batch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# gap-text → predicate (surrounding spaces significant: exact gap match)
VERB_GAPS = {
    " acquired ": "ACQUIRED",
    " works for ": "WORKS_FOR",
    " is located in ": "LOCATED_IN",
    " produces ": "PRODUCES",
    " partnered with ": "PARTNERED_WITH",
    " was born in ": "BORN_IN",
}

_CAPSEQ = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b")
_ALLCAPS = re.compile(r"\b[A-Z]{3,}\b")
_QUOTED = re.compile(r'"([^"\n]{3,60})"')

# all-caps tokens that are ordinary words/initialisms, not entity names —
# the skip predicate of the candidate family (the reference's analog is
# the private-name skip in its variable-emit heuristics, SURVEY.md E10)
ALLCAPS_SKIP = frozenset(
    {"THE", "AND", "FOR", "NOT", "ALL", "NEW", "OUT", "NOW", "GET",
     "FAQ", "PDF", "URL", "USD", "EUR", "GMT", "UTC"}
)


def _capseq_candidates(text: str) -> list[tuple[str, int, int]]:
    """Capitalized multi-word sequences ("Jane Doe") — proper-name shape."""
    return [(m.group(0), *m.span()) for m in _CAPSEQ.finditer(text)]


def _allcaps_candidates(text: str) -> list[tuple[str, int, int]]:
    """ALL-CAPS runs >= 3 chars ("NATO") minus the skip list — the web
    analog of the reference's constant-name heuristic."""
    return [
        (m.group(0), *m.span())
        for m in _ALLCAPS.finditer(text)
        if m.group(0) not in ALLCAPS_SKIP
    ]


def _quoted_candidates(text: str) -> list[tuple[str, int, int]]:
    """Double-quoted phrases (3-60 chars, single line) — titled works and
    coined terms; span excludes the quotes."""
    return [(m.group(1), m.start(1), m.end(1)) for m in _QUOTED.finditer(text)]


# E10 in full: the reference emits VARIABLE candidates through a FAMILY of
# heuristics (constant detection, type inference, private-name skip —
# python.py variable emit); the web analog is this registry of fuzzy
# candidate detectors. The pipeline default stays ("capseq",) — the
# proper-name shape — and callers opt into more recall per corpus.
CANDIDATE_HEURISTICS = {
    "capseq": _capseq_candidates,
    "allcaps": _allcaps_candidates,
    "quoted": _quoted_candidates,
}
DEFAULT_HEURISTICS = ("capseq",)


def build_automaton(surfaces: tuple[str, ...]) -> re.Pattern:
    """Compile (or fetch the executor-cached) dictionary automaton."""
    from codebased_spark.extract.automaton import cached_matcher

    return cached_matcher(tuple(surfaces))


MENTION_SCHEMA = (
    "struct<"
    "mentions: array<struct<surface: string, mstart: int, mend: int, exact: boolean>>, "
    "rels: array<struct<subj: string, pred: string, obj: string>>"
    ">"
)


def finish_scan(
    text: str,
    exact_mentions: list,
    heuristics: tuple[str, ...] = DEFAULT_HEURISTICS,
) -> tuple[list, list]:
    """Shared scan tail: fuzzy candidates + gap-pattern relations.

    Takes the exact mentions (surface, start, end, True), adds candidates
    from the configured heuristic family (CANDIDATE_HEURISTICS) that
    overlap no already-accepted span — heuristics apply in listed order,
    so earlier detectors win overlaps — and emits gap-text relations
    between consecutive mentions. Both the automaton path (scan_doc) and
    the join-based big-gazetteer fallback (mentions_join.py) run THIS
    tail, so their semantics agree by construction rather than by
    parallel implementations.
    """
    mentions = list(exact_mentions)
    taken = [(s, e) for _, s, e, _ in mentions]
    for name in heuristics:
        for surf, s, e in CANDIDATE_HEURISTICS[name](text):
            if not any(s < te and ts < e for ts, te in taken):
                mentions.append((surf, s, e, False))
                taken.append((s, e))
    mentions.sort(key=lambda t: t[1])
    rels = []
    for (s1, a1, b1, _), (s2, a2, b2, _) in zip(mentions, mentions[1:]):
        pred = VERB_GAPS.get(text[b1:a2])
        if pred is not None:
            rels.append((s1, pred, s2))
    return mentions, rels


def scan_doc(
    text: str,
    automaton: re.Pattern,
    heuristics: tuple[str, ...] = DEFAULT_HEURISTICS,
) -> tuple[list, list]:
    """One document: exact mentions, fuzzy candidates, gap-pattern relations."""
    if not text:
        return [], []
    exact = [(m.group(0), m.start(), m.end(), True) for m in automaton.finditer(text)]
    return finish_scan(text, exact, heuristics=heuristics)


def scan_mentions_series(
    text: pd.Series,
    surfaces: tuple[str, ...],
    heuristics: tuple[str, ...] = DEFAULT_HEURISTICS,
) -> pd.DataFrame:
    """Batch scan (pure pandas core, testable without Spark).

    Returns a DataFrame with columns `mentions` / `rels` (list-of-dict each),
    the shape Arrow needs for a struct-typed scalar pandas UDF.
    """
    automaton = build_automaton(surfaces)
    m_col, r_col = [], []
    for t in text:
        mentions, rels = scan_doc(t, automaton, heuristics=heuristics)
        m_col.append(
            [
                {"surface": s, "mstart": a, "mend": b, "exact": ex}
                for s, a, b, ex in mentions
            ]
        )
        r_col.append([{"subj": s, "pred": p, "obj": o} for s, p, o in rels])
    return pd.DataFrame({"mentions": m_col, "rels": r_col})


# (applicationId, len, hash) -> (surfaces, Broadcast). One gazetteer
# version is broadcast ONCE per SparkContext: repeated pipeline
# invocations in one session (steady-state benchmark loops, incremental
# batches) previously created a fresh broadcast per call and never
# released it, accumulating blocks on the driver and executors. Small
# FIFO cache; evicted entries are NOT destroy()ed — a lazily-built
# DataFrame may still close over the Broadcast, and destroying it would
# fail any later action on that frame. Dropping our reference is enough:
# once every referencing plan is gone, the driver-side Broadcast object
# is GC'd and Spark's ContextCleaner removes its blocks cluster-wide.
# Hits verify the stored tuple for equality, so a hash collision between
# two gazetteers can never silently reuse the wrong surface list.
_SURF_BCAST_CACHE: dict[tuple, tuple] = {}
_SURF_BCAST_MAX = 4


def _surfaces_broadcast(sc, surfaces: tuple[str, ...]):
    key = (sc.applicationId, len(surfaces), hash(surfaces))
    hit = _SURF_BCAST_CACHE.get(key)
    if hit is not None and hit[0] == surfaces:
        return hit[1]
    # drop cache entries from dead contexts outright
    for k in [k for k in _SURF_BCAST_CACHE if k[0] != sc.applicationId]:
        _SURF_BCAST_CACHE.pop(k, None)
    while len(_SURF_BCAST_CACHE) >= _SURF_BCAST_MAX:
        # FIFO: evict the OLDEST insertion (dicts preserve insert order)
        _SURF_BCAST_CACHE.pop(next(iter(_SURF_BCAST_CACHE)))
    b = sc.broadcast(surfaces)
    _SURF_BCAST_CACHE[key] = (surfaces, b)
    return b


def with_mentions(
    df: DataFrame,
    surfaces: list[str],
    text_col: str = "text",
    heuristics: tuple[str, ...] = DEFAULT_HEURISTICS,
) -> DataFrame:
    """Add an `extraction` struct column (mentions + rels) via Arrow UDF.

    `surfaces` ships as an ``sc.broadcast`` variable — one copy per executor
    regardless of task count, and the right shape for 10^5+-surface
    gazetteers (a closure copy per task was fine at 11 surfaces, not at 1M).
    The broadcast is cached per (SparkContext, gazetteer-version) so
    repeated pipeline calls reuse one block instead of leaking one per
    call; the compiled automaton is likewise rebuilt at most once per
    executor per gazetteer version via the module cache.
    """
    surf_b = _surfaces_broadcast(df.sparkSession.sparkContext, tuple(surfaces))

    @pandas_udf(MENTION_SCHEMA)
    def _scan(batch: pd.Series) -> pd.DataFrame:
        return scan_mentions_series(batch, surf_b.value, heuristics=heuristics)

    return df.withColumn("extraction", _scan(F.col(text_col)))
