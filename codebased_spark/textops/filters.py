"""Composed document-filter decisions — the keep/drop table a training-data
pipeline materializes before tokenization.

Individual signals exist as standalone operators (quality scoring,
repetition metrics, exact dedup); a real corpus build composes them into
ONE decision row per document with per-rule reject flags, so downstream
jobs filter with a single `keep = 1` predicate and data curators can audit
why any document was dropped (the per-rule counters are the standard
curation report). Reference analog: the parser router's skip-with-reason
behavior (SURVEY.md S5/E18) applied corpus-wide.

Rules (1 = reject by that rule; keep = 1 iff all are 0):
  r_lang       — document language is not the target language
  r_short      — fewer than `min_tokens` whitespace tokens (empty docs too)
  r_quality    — composite quality_score below `min_quality`
  r_repetitive — Gopher-style repetition thresholds tripped
  r_dup        — exact-content duplicate that is not the keep-one survivor
  r_neardup    — (near_dup=True) member of a minhash-LSH near-dup cluster
                 that is not its keep-one survivor (dedup/clusters.py)

Scale shape: quality is map-side only; repetition is two (doc_id, gram)
aggregations; the dup rule is one content-hash groupBy; all joins are
doc_id-keyed. Nothing corpus-global, no Python rows. Each rule scans the
corpus independently (column-pruned to id/text/lang at the parquet
scan) — deliberately NOT cached: at 100 TB the corpus exceeds cluster
memory, so re-reading a pruned scan is cheaper than spilling a cache,
and the scans run concurrently under the same job when the final join
executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.textops.quality import doc_quality
from codebased_spark.textops.repetition import repetition_metrics

MIN_TOKENS = 5
MIN_QUALITY = 0.5


def filter_decisions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep_lang: str = "en",
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
    near_dup: bool = False,
    neardup_threshold: float = 0.8,
) -> DataFrame:
    """(doc_id, r_lang, r_short, r_quality, r_repetitive, r_dup[, r_neardup], keep)."""
    q = doc_quality(docs, id_col, text_col).select(
        id_col, "n_tokens", "quality_score"
    )
    rep = repetition_metrics(docs, id_col, text_col).select(
        id_col, "is_repetitive"
    )
    h = docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("h"))
    surv = h.groupBy("h").agg(F.min(id_col).alias("surv_id"))
    dup = h.join(surv, "h").select(
        F.col(id_col),
        (F.col(id_col) != F.col("surv_id")).cast("int").alias("r_dup"),
    )

    flags = (
        docs.select(F.col(id_col), F.col(lang_col))
        .join(q, id_col, "left")       # quality drops token-less docs:
        .join(rep, id_col, "left")     # missing row -> r_short catches it
        .join(dup, id_col)
        .select(
            F.col(id_col),
            (F.col(lang_col) != keep_lang).cast("int").alias("r_lang"),
            (F.coalesce("n_tokens", F.lit(0)) < min_tokens)
            .cast("int").alias("r_short"),
            (F.coalesce("quality_score", F.lit(0.0)) < min_quality)
            .cast("int").alias("r_quality"),
            F.coalesce("is_repetitive", F.lit(0)).alias("r_repetitive"),
            "r_dup",
        )
    )
    rules = ["r_lang", "r_short", "r_quality", "r_repetitive", "r_dup"]
    if near_dup:
        from codebased_spark.dedup.clusters import dedup_clusters
        from codebased_spark.dedup.minhash import minhash_near_dupes

        clusters = dedup_clusters(
            docs,
            minhash_near_dupes(
                docs, n=3, threshold=neardup_threshold,
                id_col=id_col, text_col=text_col,
            ),
            id_col=id_col,
        )
        flags = flags.join(
            clusters.select(
                F.col(id_col),
                (~F.col("is_survivor")).cast("int").alias("r_neardup"),
            ),
            id_col,
        )
        rules.append("r_neardup")
    n_reject = sum(F.col(c) for c in rules)
    return flags.withColumn("keep", (n_reject == 0).cast("int"))
