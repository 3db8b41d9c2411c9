"""Blocking-quality evaluation: MinHash-LSH candidate set vs exact-Jaccard
ground truth, as per-pair confusion labels.

A production dedup pipeline must KNOW its LSH recall, not assume it —
banding parameters (b, r) trade candidate volume against missed pairs,
and the standard way to pick them is to run the blocker against exact
ground truth on a labeled sample and read off the confusion counts
(pairs completeness / pair quality in the record-linkage literature).

This module evaluates a PORTABLE-HASH MinHash (md5_hash60 permutations,
md5 band keys) so a second engine can rebuild the identical candidate
set: with k=16, b=4, r=4 the candidate probability at s is 1-(1-s^4)^4
— deliberately lossy at s≈0.6 (≈0.43) so the eval measures something
real (false negatives actually occur), while s≥0.97 pairs are caught
w.p. ≈0.9998.

Ground truth is all-pairs exact Jaccard — quadratic by nature, which is
exactly why the eval runs on an ABSOLUTE-bounded labeled sample (the
dd_embedding_exact r3 lesson: a verification baseline must be fixed-size,
not a rate, or it grows 100x^2 at 100x scale). The blocker under test
is the same banding shape as the production dedup/minhash.py path; only
the hash family differs (portable md5 vs JVM xxhash64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.minhash import _shingled
from codebased_spark.dedup.simhash import md5_hash60
from codebased_spark.util import round_stable

EVAL_K = 16
EVAL_BANDS = 4  # r = 4


def portable_minhash_candidates(
    docs: DataFrame,
    n: int = 3,
    k: int = EVAL_K,
    bands: int = EVAL_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from md5-permutation MinHash banding
    — same relational shape as dedup/minhash.py (explode once, k min
    aggregates, band keys, bucket self-join), every hash portable."""
    r = k // bands
    sh = _shingled(docs, n, id_col, text_col)
    ex = sh.select("doc", F.explode("shingles").alias("s"))
    mins = ex.groupBy("doc").agg(
        *[
            F.min(md5_hash60(F.concat(F.col("s"), F.lit(f":mh{i}")))).alias(
                f"m{i}"
            )
            for i in range(k)
        ]
    )
    bh = mins.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    md5_hash60(
                        F.concat_ws(
                            ",", *[F.col(f"m{j * r + t}") for t in range(r)]
                        )
                    )
                    for j in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    return (
        bh.alias("a")
        .join(bh.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def lsh_blocking_eval(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    k: int = EVAL_K,
    bands: int = EVAL_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-pair confusion table over candidate ∪ truth pairs:
    (doc_a, doc_b, is_candidate, is_true_pair, jaccard).

    tp = candidate ∧ true, fp = candidate ∧ ¬true, fn = ¬candidate ∧ true
    — counts derive by filtering. `docs` must already be the bounded
    labeled sample (ground truth is an all-pairs join by definition)."""
    cand = portable_minhash_candidates(
        docs, n=n, k=k, bands=bands, id_col=id_col, text_col=text_col
    ).withColumn("is_candidate", F.lit(True))
    sh = _shingled(docs, n, id_col, text_col)
    sh_a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sa"))
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sb"))
    jac = (
        sh_a.join(sh_b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter")).cast("double")
            ).alias("j"),
        )
    )
    return (
        jac.join(cand, ["doc_a", "doc_b"], "left")
        .where((F.col("j") >= threshold) | F.col("is_candidate").isNotNull())
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("is_candidate", F.lit(False)).alias("is_candidate"),
            (F.col("j") >= threshold).alias("is_true_pair"),
            round_stable(F.col("j")).alias("jaccard"),
        )
    )
