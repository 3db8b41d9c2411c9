"""Dedup-cascade stage attribution: which detector catches which pair.

A production pipeline runs dedup as a CASCADE — exact content hash first
(cheapest, catches byte-identical reposts), then MinHash-LSH resemblance
(catches boilerplate-heavy near-dups), then SimHash (catches
near-identical small edits). Tuning the cascade needs the attribution
table this module emits: for every duplicate pair, which stages flagged
it and which stage catches it FIRST in cascade order. Pairs only the
later, more expensive stages see (in_exact = 0) quantify what the cheap
stage misses — the marginal value of each tier.

Composition over existing detectors (dedup/exact.py semantics for tier
1, dedup/minhash.py tier 2, dedup/simhash.py tier 3); nothing here adds
a new shuffle beyond one union + one (doc_a, doc_b) aggregate with
map-side combine. The exact tier emits (group-min, member) pairs —
LINEAR in group size, never the quadratic all-pairs expansion of a hash
group (a 10^5-way boilerplate group contributes 10^5 - 1 rows).

Reference analog: the reference dedups exactly once by content hash
(extractor.py:702-710); the near-dup tiers and the attribution audit are
the web-corpus extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.minhash import minhash_near_dupes
from codebased_spark.dedup.simhash import simhash_near_dupes


def exact_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b) per byte-identical pair, doc_a = the hash group's
    min id (the survivor), one row per non-survivor member."""
    hashed = docs.select(
        F.col(id_col).alias("doc_b"), F.sha2(F.col(text_col), 256).alias("_h")
    )
    reps = hashed.groupBy("_h").agg(F.min("doc_b").alias("doc_a"))
    return (
        hashed.join(reps, "_h")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


def dedup_cascade(
    docs: DataFrame,
    n: int = 3,
    minhash_threshold: float = 0.8,
    max_hamming: int = 3,
    min_jaccard: float = 0.5,
    portable_hash: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, in_exact, in_minhash, in_simhash, stage) for every
    pair any tier flags; stage = the first cascade tier that catches it
    ('exact' > 'minhash' > 'simhash'). All tiers emit doc_a < doc_b, so
    the union keys align without re-orientation."""
    ex = exact_pairs(docs).select(
        "doc_a", "doc_b",
        F.lit(1).alias("in_exact"),
        F.lit(0).alias("in_minhash"),
        F.lit(0).alias("in_simhash"),
    )
    mh = minhash_near_dupes(docs, n=n, threshold=minhash_threshold).select(
        "doc_a", "doc_b",
        F.lit(0).alias("in_exact"),
        F.lit(1).alias("in_minhash"),
        F.lit(0).alias("in_simhash"),
    )
    sh = simhash_near_dupes(
        docs, n=n, max_hamming=max_hamming, min_jaccard=min_jaccard,
        portable_hash=portable_hash,
    ).select(
        "doc_a", "doc_b",
        F.lit(0).alias("in_exact"),
        F.lit(0).alias("in_minhash"),
        F.lit(1).alias("in_simhash"),
    )
    flagged = (
        ex.unionByName(mh)
        .unionByName(sh)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("in_exact").alias("in_exact"),
            F.max("in_minhash").alias("in_minhash"),
            F.max("in_simhash").alias("in_simhash"),
        )
    )
    stage = (
        F.when(F.col("in_exact") == 1, F.lit("exact"))
        .when(F.col("in_minhash") == 1, F.lit("minhash"))
        .otherwise(F.lit("simhash"))
    )
    return flagged.withColumn("stage", stage)
