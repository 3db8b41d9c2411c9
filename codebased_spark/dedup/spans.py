"""Cross-document duplicated-span statistics — the exact-substring
dedup signal ("Deduplicating Training Data Makes Language Models
Better", Lee et al. 2022): a span of n consecutive tokens that appears
verbatim in >= 2 distinct documents marks memorization-prone training
text. Production pipelines use the per-doc duplicated fraction as a
filter feature next to minhash near-dup clustering (which catches
whole-doc dups; this catches shared passages inside otherwise-distinct
docs — quotes, licenses, templated paragraphs).

Shape at 100 TB: span construction is pure JVM expressions map-side
(dedup/shingles.py zip_with n-grams, whole-stage codegen); the corpus
pass is ONE shuffle keyed by span hash (a window count — streaming agg,
so a stop-span appearing in millions of docs costs a scan, never a
buffer) plus one per-doc aggregate. Spans are md5-prefix hashed before
the shuffle so shuffle rows are (doc_id, 16-byte hash), never the text.
Collision note: 64-bit-equivalent prefixes make cross-doc false shares
negligible at 10^12 spans; the DuckDB oracle hashes identically so the
check is bit-exact either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codebased_spark.dedup.shingles import shingles_col, tokens_col
from codebased_spark.util import round_stable


def dup_span_stats(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_spans, n_cross_dup, dup_frac) per document, where spans are
    DISTINCT n-token windows and n_cross_dup counts those also present in
    at least one OTHER document. dup_frac is rounded to 4 decimals."""
    spans = docs.select(
        F.col(id_col),
        shingles_col(tokens_col(F.col(text_col)), n).alias("spans"),
    )
    # hash + dedupe INSIDE the array (map-side, no extra shuffle); the
    # oracle mirrors the same (doc, hash)-level distinct
    grams = spans.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform("spans", lambda s: F.substring(F.md5(s), 1, 16))
            )
        ).alias("h"),
    )
    # spans are distinct within a doc, so count-per-hash == distinct docs
    per_gram = grams.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    cross = (
        per_gram.where(F.col("n_docs") >= 2)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_cross_dup"))
    )
    totals = spans.select(id_col, F.size("spans").cast("long").alias("n_spans"))
    out = totals.join(cross, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce(F.col("n_cross_dup"), F.lit(0)).cast("long").alias("n_cross_dup"),
        F.when(
            F.col("n_spans") > 0,
            round_stable(
                F.coalesce(F.col("n_cross_dup"), F.lit(0))
                / F.col("n_spans").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
    return out
