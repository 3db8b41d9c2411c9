"""Asymmetric shingle containment join (Broder, SEQUENCES 1997).

Jaccard resemblance misses the commonest real-web duplication shape:
a SMALL document living inside a BIG one — syndicated quotes, article
bodies wrapped in boilerplate-heavy portals, chunked excerpts re-posted
whole. A 40-token quote inside a 4000-token page has Jaccard ~0.01 but
containment 1.0. Training-data pipelines drop (or down-weight) contained
docs so the big host page doesn't smuggle the duplicate text past the
resemblance-based dedup passes (dedup/ngram.py, dedup/minhash.py).

containment(A -> B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|

Exact and scale-shaped like ngram.py's counting join: explode distinct
shingles (pure JVM, map-side), one self-join on the shingle keyed by the
inverted index, one (inner, outer) count = |intersection|, then a narrow
size join. Every shuffled row is a pair of longs. The one-sided length
filter |B| >= t*|A| is applied at verify (containment needs no lower
bound on the big side, unlike Jaccard's symmetric filter). For corpora
where stop-shingles blow up sum(df^2), the same prefix-filter split as
ngram_jaccard_pairs_prefix applies — for containment >= t the probing
prefix of A is its |A| - ceil(t*|A|) + 1 rarest shingles (Bayardo et
al.'s bound, one-sided).

Reference analog: the reference dedups identical files by content hash
only (SURVEY S6/S8); containment is the web-corpus generalization this
engine adds for the 100 TB training-data use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ordered pairs (doc_inner, doc_outer, containment) with
    containment(inner -> outer) >= threshold, inner != outer.

    Exact: every candidate's intersection is counted over the full
    distinct-shingle sets. Containment rounded to 4 decimals with the
    engine-stable floor(x*1e4+0.5) both the oracle replicates bit-for-bit
    (IEEE division of the same two longs is identical in JVM and DuckDB).
    """
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    exploded = sh.select("doc", F.explode("shingles").alias("sh"))
    sizes = sh.select("doc", F.size("shingles").alias("sz"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"), "sh")
        .where(F.col("a.doc") != F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_inner"), F.col("b.doc").alias("doc_outer")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc").alias("doc_inner"), F.col("sz").alias("sz_in")),
            "doc_inner",
        )
        .withColumn(
            "containment", F.col("inter") / F.col("sz_in").cast("double")
        )
        .where(F.col("containment") >= threshold)
        .select(
            "doc_inner",
            "doc_outer",
            round_stable(F.col("containment")).alias("containment"),
        )
    )
