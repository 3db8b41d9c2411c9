"""Sentence segmentation — the unit-of-text op under sentence-level
dedup, PII scanning, and bitext sentence alignment.

Rule: a sentence is a maximal run of non-terminator characters plus its
trailing terminators (`[^.!?]+[.!?]*`), trimmed; whitespace-only matches
are dropped. Deliberately regular-language simple — the pattern is valid
and IDENTICAL under Java regex (Spark) and RE2 (DuckDB), so the split is
engine-exact and the driver row is value-checked (lookbehind splitters
are not RE2-expressible and abbreviation models are not deterministic
across engines; pipelines that need them plug a model into the same
explode shape).

Scale shape: one regexp_extract_all + posexplode — map-only, no shuffle;
sentence ordinals are per-document positions, not a global sort.

Reference analog: SURVEY.md E16/E17 (regex feature mining / counting
metrics) applied at the sub-document granularity the reference's
per-entity snippet extraction implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTENCE_RE = r"[^.!?]+[.!?]*"


def sentence_occurrence_flags(
    sents: DataFrame,
    min_count: int = 3,
    sentence_col: str = "sentence",
) -> DataFrame:
    """sents + (n_occurrences, keep): the C4 repeated-line rule — any
    sentence occurring >= min_count times corpus-wide is boilerplate
    (cookie banners, footers) and is flagged keep=false.

    Scale shape: the corpus-wide count groups on xxhash64(sentence), so
    the count shuffle moves 8-byte keys, not strings, and map-side
    combine collapses the heavy hitters early (the whole point — the
    boilerplate sentences ARE the skewed keys). The count table is
    distinct-sentence-sized; the flag join is hash-keyed. A 64-bit
    collision mislabels a pair of distinct sentences, the accepted
    trade in every production line-dedup.
    """
    h = F.xxhash64(sentence_col)
    counts = (
        sents.select(h.alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        sents.withColumn("_h", h)
        .join(counts, "_h")
        .drop("_h")
        .withColumn("keep", F.col("n_occurrences") < min_count)
    )


def split_sentences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sent_idx, sentence, n_chars): sent_idx is the 0-based RAW
    match position (stable even where whitespace-only matches were
    dropped, so it stays a usable offset key for re-joining)."""
    parts = F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0)
    return (
        docs.select(
            F.col(id_col), F.posexplode(parts).alias("sent_idx", "_raw")
        )
        .select(
            id_col,
            "sent_idx",
            F.trim(F.col("_raw")).alias("sentence"),
        )
        .where(F.col("sentence") != "")
        .withColumn("n_chars", F.length("sentence"))
    )
