"""Benchmark decontamination: corpus × benchmark fingerprint overlap.

THE training-data hygiene operator: before a corpus is used for training,
every document is checked against the evaluation benchmarks' text; docs
sharing a substantial fraction of winnowing fingerprints (Schleimer et al.,
SIGMOD'03 — guaranteed detection of shared substrings >= w+k-1 tokens)
are flagged as contaminated and dropped/quarantined.

Both sides reuse textops/fingerprint.winnow_fingerprints, so detection
strength and the SQL oracle are shared with tx_winnow. Scale shape: the
benchmark fingerprint set is tiny relative to the corpus (thousands of
eval items vs 10^12 docs) — it broadcasts, so the contamination check is
a map-side semi join plus one per-doc aggregation; the corpus is never
shuffled against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.textops.fingerprint import winnow_fingerprints
from codebased_spark.util import round_stable


def decontaminate(
    docs: DataFrame,
    benchmark_docs: DataFrame,
    k: int = 3,
    w: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_fp, n_hit, overlap, contaminated) per corpus doc.

    overlap = fraction of the doc's winnow fingerprints that also occur in
    ANY benchmark doc; contaminated = overlap >= threshold (compared on
    the raw ratio — the rounded `overlap` column is for reporting).
    """
    corpus_fp = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    bench_fp = (
        winnow_fingerprints(benchmark_docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("fingerprint")
        .distinct()
    )
    per_doc = corpus_fp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    hits = (
        corpus_fp.join(F.broadcast(bench_fp), "fingerprint", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    ratio = F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_fp").cast("double")
    return (
        per_doc.join(hits, id_col, "left")
        .select(
            id_col,
            "n_fp",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            round_stable(ratio).alias("overlap"),
            F.when(ratio >= threshold, 1).otherwise(0).alias("contaminated"),
        )
    )
