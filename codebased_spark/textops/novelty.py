"""First-seen n-gram novelty — how much of a document is new text.

Corpus-curriculum and memorization work orders documents by ingest
position and asks, per document, what fraction of its n-grams the
corpus has never produced before (Lee et al.'s dedup studies measure
its inverse — re-emitted text). Low-novelty docs late in the stream are
templated/boilerplate re-emissions that exact and near-dup passes can
miss when the duplication is fragmentary; they are prime down-weighting
candidates. This is an ORDER-aware statistic: unlike tx_lm_score's
corpus-frequency fraction, the same bigram counts as novel in its FIRST
document and seen everywhere after.

Shape: distinct bigrams explode map-side; one vocabulary-sized
(bigram -> min doc_id) aggregation with map-side combine; one
bigram-keyed join back; one per-doc count. Gate columns are exact
integers plus one IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import shingles_col, tokens_col


def novelty_profile(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty) per doc with >= 1 n-gram.
    novelty = fraction of the doc's DISTINCT n-grams whose corpus-wide
    first occurrence (min doc_id) is this doc."""
    grams = docs.select(
        F.col(id_col),
        F.explode(shingles_col(tokens_col(F.col(text_col)), n)).alias("g"),
    )
    first = grams.groupBy("g").agg(F.min(id_col).alias("first_doc"))
    return (
        grams.join(first, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_grams"))
    )
