"""Integer-quantized BM25 retrieval — top-k documents per query.

A web-scale corpus pipeline scores documents against query sets for
retrieval-training data (hard-negative mining, query-doc relevance
labels — the same consumer as textops/retrieval_pairs.py). BM25 is the
standard lexical scorer; the float formulation mixes a transcendental
idf with fractional length normalization, which is not cross-engine
bit-stable. This module uses an exact INTEGER quantization both Spark
and any ANSI engine evaluate identically:

- idf_bits(t)  = bit_length(N // df_t)   — floor-log2 idf via the binary
  string length (``length(bin(x))``), the same log2-as-bit-length trick
  as textops/classify.py; never a libm call.
- per-term score (k1 = 6/5, b = 3/4 multiplied through to integers):

      tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)  with avgdl = L/N
    = 44*tf*L / (20*tf*L + 6*L + 18*dl*N)

  so  score_milli = (idf_bits * 44 * tf * L * 1000) div (20*tf*L + 6*L + 18*dl*N)

  — one integer division, identical in Spark (`div`) and DuckDB (`//`).
  Int64 bound: idf_bits<=63, tf<=dl, so the numerator is
  <= 63*44*1000 * tf*L ~ 2.8e6 * tf * L; safe while tf*L < 3.3e12
  (e.g. tf<=10^4 with L<=3x10^8 tokens). At larger corpus sizes drop the
  *1000 milli factor or compute per-shard L — documented, not silent.

Scale shape: the token scan filters to the query vocabulary BEFORE any
shuffle (the vocabulary is a literal isin — Catalyst folds it into the
scan filter), so tf aggregates only matching tokens; doc length is one
narrow (doc_id, count) aggregation over the same scan; N and L arrive as
a broadcast 1-row aggregate; df is vocabulary-sized. Top-k per query is
one window over (query_id) — the number of queries bounds the partition
count, and the scored set is already vocabulary-restricted.

Reference analog: SURVEY.md A4's top-k-over-join discipline applied to
the retrieval scorer the reference lacks (training-data extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _scored(
    docs: DataFrame,
    queries: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score_milli, n_terms, n_query_terms): summed
    per-term integer BM25 plus coverage counts per (query, doc)."""
    vocab = sorted({t for ts in queries.values() for t in ts})
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("l_total")
    )
    tf = (
        toks.where(F.col("term").isin(vocab))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = [
        (qid, t, len(set(ts)))
        for qid, ts in sorted(queries.items())
        for t in sorted(set(ts))
    ]
    qdf = docs.sparkSession.createDataFrame(
        qterms, "query_id string, term string, n_query_terms int"
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf_bits", F.length(F.bin(F.expr("n_docs div df"))).cast("long")
        )
        .withColumn(
            "score_milli",
            F.expr(
                "(idf_bits * 44 * tf * l_total * 1000) div "
                "(20 * tf * l_total + 6 * l_total + 18 * dl * n_docs)"
            ),
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("score_milli").alias("score_milli"),
            F.count(F.lit(1)).alias("n_terms"),
            F.first("n_query_terms").alias("n_query_terms"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score_milli, rank): top-k docs per query by the
    integer-quantized BM25 above; ties broken by min doc_id."""
    scored = _scored(docs, queries, id_col, text_col)
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_milli", "rank")
    )


def hard_negatives(
    docs: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, score_milli, n_terms, rank): top-k HARD
    NEGATIVES per query — docs that score high on BM25 yet are missing at
    least one query term (n_terms < |query|). This is the standard
    hard-negative mining pass for retrieval/embedding training: lexically
    close non-answers make the informative contrastive pairs, while
    full-coverage docs are treated as (pseudo-)positives and excluded.

    Same scale shape as bm25_topk — the coverage count falls out of the
    existing (query, doc) aggregation for free; no extra scan or shuffle.
    """
    scored = _scored(docs, queries, id_col, text_col)
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("doc_id")
    )
    return (
        scored.where(F.col("n_terms") < F.col("n_query_terms"))
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_milli", "n_terms", "rank")
    )
