"""DSIR-style importance weights for data selection (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The production question: given a huge raw crawl and a small TARGET
corpus you wish the training mix resembled (wiki, textbooks, a curated
benchmark), score every raw document by how target-like it is, then
resample by the weights. DSIR's estimator is a ratio of two bag-of-
hashed-ngrams unigram models: hash each word bigram into a fixed-dim
bucket space (no vocabulary pass — the same 10^12-doc property as
textops/feature_hash.py), fit target and raw bucket distributions with
add-one smoothing, and weight a document by its features' likelihood
ratio.

Exactness discipline: the paper's weight is sum_b log(p_t[b]/p_r[b]) —
a transcendental the oracle gate cannot hash bit-for-bit (the PMI
lesson, ADVICE r3). The registered surface therefore emits the exact
integer masses target_mass = sum_b(ct[b]+1) and raw_mass = sum_b(cr[b]+1)
plus their single-division ratio (IEEE division of two longs is
identical on JVM and DuckDB); `log_weight` is provided for production
callers but excluded from the value-checked gate. Ranking by the ratio
of smoothed masses is the same decision family; the pytest pins that a
planted target-like doc outranks a background doc under BOTH forms.

Scale shape: one map-side explode (bigram -> md5 bucket, pure JVM), two
dim-bounded aggs with map-side combine (the distributions are <= dim
rows — broadcast back), one per-doc agg. Token strings never shuffle;
only (doc_id, bucket) longs do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import ngrams_col, tokens_col


def _bucket(col: Column, dim: int) -> Column:
    """First 8 hex chars of md5 mod dim — exists verbatim in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % dim


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_feats, target_mass, raw_mass, score, log_weight) per doc
    with >= 1 word bigram. `is_target` marks the rows whose bucket
    distribution defines the target; every doc is scored (including
    target members — useful as a sanity diagnostic: they should rank
    high). score = target_mass / raw_mass; log_weight = ln(score)."""
    occ = docs.select(
        F.col(id_col),
        is_target.alias("tgt"),
        F.explode(ngrams_col(tokens_col(F.col(text_col)), 2)).alias("bg"),
    ).select(id_col, "tgt", _bucket(F.col("bg"), dim).alias("bucket"))
    tgt_counts = (
        occ.where(F.col("tgt")).groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    )
    raw_counts = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    return (
        occ.join(F.broadcast(tgt_counts), "bucket", "left")
        .join(F.broadcast(raw_counts), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("ct"), F.lit(0)) + 1).alias("target_mass"),
            F.sum(F.col("cr") + 1).alias("raw_mass"),
        )
        .withColumn("score", F.col("target_mass") / F.col("raw_mass"))
        .withColumn("log_weight", F.log(F.col("score")))
    )
