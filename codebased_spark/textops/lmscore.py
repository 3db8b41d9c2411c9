"""Corpus-LM quality scoring, exactly-checkable variant.

CCNet scores documents with a KenLM perplexity and buckets by it; the
engine-exact stand-in here is the KNOWN-BIGRAM FRACTION: the share of a
document's bigram instances whose corpus-wide frequency reaches min_df.
Fluent in-distribution text is built from common constructions (high
fraction); gibberish and boilerplate-stripped fragments are not. Unlike
log-probability, the statistic is a ratio of integer counts, so the
DuckDB oracle matches bit-for-bit (the ADVICE r3 transcendental-rounding
lesson: keep gated doubles rational).

Scale shape: bigram instances explode map-side; the corpus-wide count
groups on xxhash64(bigram) — 8-byte shuffle keys, heavy hitters combine
map-side (same discipline as sentence_occurrence_flags); the per-doc
rollup joins counts back by hash and aggregates narrow longs. Two
shuffles total, both hash-keyed, strings never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def known_bigram_fraction(
    docs: DataFrame,
    min_df: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, n_known, known_fraction). Docs with fewer than two
    tokens have no bigrams and emit no row."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    inst = (
        docs.where(n >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .withColumn("_h", F.xxhash64("bg"))
        .drop("bg")
    )
    counts = inst.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    return (
        inst.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(F.col("_df") >= min_df, 1)).alias("n_known"),
        )
        .withColumn(
            "known_fraction",
            round_stable(
                F.col("n_known").cast("double") / F.col("n_bigrams")
            ),
        )
    )
