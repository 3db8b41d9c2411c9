"""CCNet-style per-language quality bucketing (head / middle / tail).

The standard corpus-curation step after per-doc quality scoring (CCNet,
Wenzek et al. 2020): within each language, split documents into thirds
by quality so the training mix can up-weight the head and drop or
down-weight the tail.

Scale shape — the naive implementation (ntile over a window partitioned
by language) sorts each language's entire corpus in ONE task, which is
exactly the skew bottleneck a 100 TB corpus with 3 dominant languages
cannot afford. Instead this does the threshold-histogram design:

1. histogram the ROUNDED scores per (lang, score) — a map-side-combined
   aggregate whose output is vocabulary-sized (scores are 4-decimal
   rounded, so ≤ 10^4 distinct values per language);
2. a cumulative window over that tiny histogram picks the head/middle
   cut scores per language (ceil(N/3) / ceil(2N/3) from the top);
3. the cuts broadcast back and bucket assignment is a map-side CASE —
   the corpus is never globally sorted and the only corpus-sized
   shuffle is the histogram's partial-agg.

Ties at a cut score all land in the same (higher) bucket — deterministic
by construction (a property ntile's arbitrary tie-split lacks), so the
result is reproducible across runs and engines, and a SQL oracle can
state it exactly.

Reference analog: SURVEY.md A2/A4 (counts-by-type, top-k over join) —
the reference ranks entities by aggregate metrics; this is the corpus-
curation counterpart that ranks and buckets documents by quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_bucket_thresholds(
    scored: DataFrame, lang_col: str = "lang", score_col: str = "quality_score"
) -> DataFrame:
    """(lang, t_head, t_mid, n_docs): per-language cut scores.

    t_head = max score s.t. |{score' >= t_head}| >= ceil(N/3); t_mid
    likewise for ceil(2N/3). Head = score >= t_head, middle = score >=
    t_mid (and < t_head), tail = rest. The window runs over the
    histogram, not the corpus.
    """
    hist = scored.groupBy(lang_col, score_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy(lang_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(lang_col)
    cum = hist.select(
        lang_col,
        score_col,
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    t1 = F.floor((F.col("n") + 2) / F.lit(3.0))
    t2 = F.floor((F.col("n") * 2 + 2) / F.lit(3.0))
    return cum.groupBy(lang_col).agg(
        F.max(F.when(F.col("cum") >= t1, F.col(score_col))).alias("t_head"),
        F.max(F.when(F.col("cum") >= t2, F.col(score_col))).alias("t_mid"),
        F.max("n").alias("n_docs"),
    )


def assign_quality_buckets(
    scored: DataFrame, lang_col: str = "lang", score_col: str = "quality_score"
) -> DataFrame:
    """scored + (bucket) — 'head' / 'middle' / 'tail' per language third.

    Broadcast join of the per-language cuts (one row per language), then
    a map-side CASE: no corpus-wide sort anywhere.
    """
    cuts = quality_bucket_thresholds(scored, lang_col, score_col)
    bucket = (
        F.when(F.col(score_col) >= F.col("t_head"), "head")
        .when(F.col(score_col) >= F.col("t_mid"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), lang_col)
        .withColumn("bucket", bucket)
        .drop("t_head", "t_mid", "n_docs")
    )
