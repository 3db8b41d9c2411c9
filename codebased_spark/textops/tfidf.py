"""Corpus TF-IDF and per-document top terms — fully relational.

The classic keyword-extraction primitive, as three aggregations with no
Python anywhere: term frequency (groupBy doc+word), document frequency
(groupBy word over distinct doc-word pairs), smoothed idf
ln((1+N)/(1+df)) + 1 (the sklearn convention), then a per-doc row_number
window for the top-k. At corpus scale the df table is vocabulary-sized
(broadcastable) and the only large shuffle is the tf groupBy — the same
shape as the token-counting operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tfidf, rank) — top-k scoring terms per document."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_ = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + 1.0,
        )
    )
    # rank on the ROUNDED score: Java's Math.log and libm's log may differ
    # in the last ulp, and an unrounded near-tie could rank differently
    # across engines; rounded ties break on the term, identically everywhere
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("score", round_stable(F.col("tf") * F.col("idf")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", F.col("score").alias("tfidf"), "rank")
    )
