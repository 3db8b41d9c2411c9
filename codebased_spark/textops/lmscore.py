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


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, nlp_q2, avg_nlp_bp): corpus-trained bigram LM
    negative log-probability, log2-QUANTIZED to exact integers — the
    CCNet-style perplexity quality score with the transcendental part
    removed (the textops/classify.py discipline: every log is bit_length,
    exact in codegen on both engines).

    Per bigram instance (w1, w2): P(w2|w1) = B(w1 w2) / U(w1) with
    U(w1) = count of bigram instances headed by w1, so the per-instance
    cost BL(U) - BL(B) >= 0 and the doc score is a non-negative BIGINT
    sum (lower = more predictable text). avg_nlp_bp scales by 10^4 with
    integer division of non-negatives (floor == truncate, both engines).

    Scale shape: instances explode map-side; B and U are two hash-keyed
    counts (xxhash64 shuffle keys, strings never shuffle; counts are
    collision-equal to string grouping, same disclosure as
    known_bigram_fraction); the rollup joins the counts back by hash —
    AQE broadcasts them when the vocabulary is small — and aggregates
    narrow longs.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    heads = F.slice(toks, 1, n - 1)
    inst = (
        docs.where(n >= 2)
        .select(
            F.col(id_col),
            F.explode(F.arrays_zip(bigrams.alias("bg"), heads.alias("w1"))).alias(
                "z"
            ),
        )
        .select(
            id_col,
            F.xxhash64("z.bg").alias("h_bg"),
            F.xxhash64("z.w1").alias("h_w1"),
        )
    )
    cb = inst.groupBy("h_bg").agg(F.count(F.lit(1)).alias("b_cnt"))
    cu = inst.groupBy("h_w1").agg(F.count(F.lit(1)).alias("u_cnt"))
    bl = lambda c: F.length(F.bin(c))  # noqa: E731 — floor(log2)+1, exact
    return (
        inst.join(cb, "h_bg")
        .join(cu, "h_w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(bl(F.col("u_cnt")) - bl(F.col("b_cnt"))).alias("nlp_q2"),
        )
        .withColumn(
            "avg_nlp_bp",
            F.expr("nlp_q2 * 10000 div n_bigrams"),
        )
    )
