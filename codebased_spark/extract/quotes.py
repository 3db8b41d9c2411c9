"""Quotation attribution — (speaker, SAID, quote) triple mining.

News/web corpora carry reported speech; attributing each quoted span to
its speaker yields the QUOTED_AS edges a knowledge graph serves for
"who said what" queries, and the (speaker, quote) pairs a dialogue /
attribution training set needs. Reference analog: the open-triple gap
patterns (SURVEY.md E9) — same surface-syntax mechanism, aimed at the
reported-speech relation.

Two classic argument orders (Pareja-Lora/PARC-style):
  quote_first  — "…quote…", said Ada Lovelock.
  speaker_first — Ada Lovelock said: "…quote…"

Real-web tolerance: straight AND curly quotes (“ ”), optional
comma before the verb, case-insensitive speech verb ((?i:…) scoped so
the speaker-name capital pattern stays case-sensitive). Unattributed
quoted spans (no adjacent speech verb + Name) are NOT emitted — the
fixture plants a decoy to keep that negative non-vacuous.

Scale shape: one regexp_extract_all pass per argument order, per-match
group recovery via transform — all JVM codegen, map-only, no shuffle
until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Q_OPEN = '["“]'
_Q_CLOSE = '["”]'
_SPAN = '([^"“”]+)'
# two capitalized words, optional digits on the surname (synthetic ids)
_NAME = r"([A-Z][a-z]+ [A-Z][a-z]+[0-9]*)"
_VERB = r"(?i:said|says|stated|added)"

# name -> (regex, quote_group, speaker_group)
QUOTE_PATTERNS: dict[str, tuple[str, int, int]] = {
    "quote_first": (rf"{_Q_OPEN}{_SPAN}{_Q_CLOSE},? {_VERB} {_NAME}", 1, 2),
    "speaker_first": (rf"{_NAME} {_VERB}:? {_Q_OPEN}{_SPAN}{_Q_CLOSE}", 2, 1),
}


def quote_pairs_col(text: Column) -> Column:
    """array<struct<speaker,quote,pattern>> of every attributed quote."""
    def make_pair_of(name, rx, qg, sg):
        # factory, not default-arg capture: F.transform inspects the
        # lambda's arity, so extra bound parameters would break it
        def pair_of(m):
            return F.struct(
                F.regexp_extract(m, rx, sg).alias("speaker"),
                F.regexp_extract(m, rx, qg).alias("quote"),
                F.lit(name).alias("pattern"),
            )

        return pair_of

    arrays = []
    for name, (rx, qg, sg) in QUOTE_PATTERNS.items():
        matches = F.regexp_extract_all(text, F.lit(rx), 0)
        arrays.append(F.transform(matches, make_pair_of(name, rx, qg, sg)))
    return F.concat(*arrays)


def extract_quotes(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, speaker, quote, pattern) — one row per attributed quotation."""
    return docs.select(
        id_col, F.explode(quote_pairs_col(F.col(text_col))).alias("q")
    ).select(id_col, "q.speaker", "q.quote", "q.pattern")
