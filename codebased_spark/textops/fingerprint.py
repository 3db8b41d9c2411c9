"""Winnowing document fingerprints (Schleimer et al., SIGMOD'03).

Every document is reduced to the set of minimum k-gram hashes over sliding
windows of w consecutive k-grams — the standard plagiarism/near-dup
fingerprint with guaranteed match detection for substrings >= w+k-1 tokens.

Hash choice: substr(md5(kgram), 1, 8). md5 exists verbatim in Spark and in
every SQL oracle, and for fixed-width lowercase hex the lexicographic min
equals the numeric min — so the whole operator stays portable between the
Spark plan and the ANSI-SQL twin, with no custom hash UDF. All JVM:
transform/slice for windows, array_min per window, array_distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import ngrams_col, tokens_col


def _kgram_hashes(toks: Column, k: int) -> Column:
    """Ordered (not distinct) k-gram hash sequence.

    Built on the zip_with n-gram builder (shingles.ngrams_col) — a
    per-index slice() lambda here re-tokenizes the document once per
    k-gram via CollapseProject inlining (the same O(n^2) trap documented
    on shingles_col)."""
    return F.transform(
        ngrams_col(toks, k),
        lambda g: F.substring(F.md5(g), 1, 8),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fingerprint) — one row per distinct selected hash.

    Implementation note: the windows are computed RELATIONALLY — posexplode
    the hash sequence and take min() over a sliding row frame — rather than
    with nested array slice() expressions. The array formulation looks
    natural but Catalyst's CollapseProject inlines the md5-transform into
    every slice(), recomputing all n hashes per window (O(n^2) md5 per doc;
    measured 20x slower at sf0.1). The explode+window form is one shuffle
    of (doc, pos, hash) partitioned by doc — linear and scalable.
    """
    hashed = docs.select(
        F.col(id_col), _kgram_hashes(tokens_col(F.col(text_col)), k).alias("hs")
    )
    ex = hashed.select(
        F.col(id_col),
        F.size("hs").alias("n"),
        F.posexplode("hs").alias("pos", "h"),
    )
    # docs shorter than one full window keep every hash (degenerate case)
    short = ex.where(F.col("n") < w).select(id_col, F.col("h").alias("fingerprint"))
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    longw = (
        ex.where(F.col("n") >= w)
        .withColumn("m", F.min("h").over(frame))
        .where(F.col("pos") <= F.col("n") - w)
        .select(id_col, F.col("m").alias("fingerprint"))
    )
    return short.unionByName(longw).distinct()
