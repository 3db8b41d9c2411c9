"""FAQ question/answer pair mining — instruction-tuning data from web text.

Production SFT pipelines mine natural Q/A pairs from FAQ pages, help
centers, and StackExchange-style markup (public recipe: Dolma / OpenAssistant
data notes); the extractor is the same closed-class pattern family as
`extract/patterns.py` (reference E14 analog, SURVEY.md §2.2: several typed
extractor families over the same document), retargeted from entity spans to
question/answer span PAIRS, matched as single adjacent Q-then-A spans so
alignment is structural, not positional.

Shape at 100 TB: one `regexp_extract_all` pass + `posexplode` + two
per-span `regexp_extract`s — all JVM whole-stage codegen, zero Python,
map-only (no shuffle until the caller aggregates). Per-doc output is
bounded by the number of "Q:" markers, so the explode fans out linearly
in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a question runs from "Q: " to the first '?'; its answer from the
# following "A: " to the first '.' — the Q/A marker grammar FAQ markup
# renders to once tags are stripped
Q_PATTERN = r"Q: ([^?]*\?)"
A_PATTERN = r"A: ([^.]*\.)"
# one match per ADJACENT question/answer: the answer must appear after its
# question with no other "Q: " marker in between (tempered dot), so an
# unanswered question mid-document is skipped instead of shifting every
# later answer onto the wrong question (the failure mode of zipping two
# independently-extracted lists)
PAIR_PATTERN = r"(?s)Q: [^?]*\?(?:(?!Q: ).)*?A: [^.]*\."


def qa_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pair_idx, question, answer, a_chars) — aligned Q/A pairs per
    document. Each pair comes from ONE regex match anchoring the answer
    after its question (PAIR_PATTERN), so an unanswered question or
    orphan answer mid-document drops that cue only — it can never
    misalign the pairs that follow it."""
    pairs = F.regexp_extract_all(
        F.col(text_col), F.lit(PAIR_PATTERN), F.lit(0)
    )
    span = F.col("span")
    return (
        docs.select(F.col(id_col), F.posexplode(pairs).alias("pos", "span"))
        .select(
            id_col,
            (F.col("pos") + 1).alias("pair_idx"),
            F.regexp_extract(span, Q_PATTERN, 1).alias("question"),
            F.regexp_extract(span, A_PATTERN, 1).alias("answer"),
        )
        .withColumn("a_chars", F.length("answer"))
    )
