"""N-gram repetition metrics — the Gopher-style repetition filters.

Per-document repetition signals used by training-data pipelines to drop
boilerplate/spam (Rae et al. 2021 "Scaling Language Models" §A1.1 lists
"fraction of characters in the most common 2-gram" and "fraction of
characters in duplicate 5-grams"; we compute the word-slot variants of
both, which need no character bookkeeping and stay integer-exact across
engines):

  top_bigram_frac  — occurrences of the most frequent word 2-gram
                     divided by the total number of 2-grams.
  dup_5gram_frac   — occurrences of word 5-grams that appear more than
                     once, divided by the total number of 5-grams.

Reference analog: the complexity/LoC heuristics family (SURVEY.md E7/A7 —
per-document scalar metrics over parsed content); here the metric family
is the one a web-corpus pipeline actually runs.

Scale shape: the n-gram arrays are built MAP-SIDE from the split words
(one `transform` over an index sequence — no shuffle, no UDF); the only
shuffles are two (doc_id, gram)-keyed aggregations with map-side partial
aggregation, then a doc_id-keyed reduce. Nothing is corpus-global: every
key is per-document, so the job scales linearly and skew is bounded by
the longest single document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable

TOP_BIGRAM_MAX = 0.20  # flag threshold: top 2-gram share of all 2-grams
DUP_5GRAM_MAX = 0.30   # flag threshold: duplicated 5-gram occurrence share


def _words(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def _grams(words_col: str, n: int) -> Column:
    """All word n-grams as strings, built map-side (empty if < n words)."""
    w = F.col(words_col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, top_bigram_frac, dup_5gram_frac, is_repetitive).

    Fractions are ratios of integer counts (bit-identical doubles on any
    engine) rounded to 4 decimals; docs with no words are dropped, docs
    too short for an n-gram get fraction 0.0.
    """
    base = (
        docs.select(F.col(id_col), _words(text_col).alias("w"))
        .where(F.size("w") > 0)
        .select(id_col, "w", F.size("w").alias("n_words"))
    )

    top2 = (
        base.select(id_col, F.explode(_grams("w", 2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("max2"), F.sum("c").alias("tot2"))
    )
    dup5 = (
        base.select(id_col, F.explode(_grams("w", 5)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup5"),
            F.sum("c").alias("tot5"),
        )
    )

    top_frac = round_stable(
        F.coalesce(F.col("max2") / F.col("tot2").cast("double"), F.lit(0.0))
    )
    dup_frac = round_stable(
        F.coalesce(F.col("dup5") / F.col("tot5").cast("double"), F.lit(0.0))
    )
    return (
        base.select(id_col, "n_words")
        .join(top2, id_col, "left")
        .join(dup5, id_col, "left")
        .select(
            id_col,
            "n_words",
            top_frac.alias("top_bigram_frac"),
            dup_frac.alias("dup_5gram_frac"),
            (
                (top_frac >= TOP_BIGRAM_MAX) | (dup_frac >= DUP_5GRAM_MAX)
            ).cast("int").alias("is_repetitive"),
        )
    )
