"""Negative sampling for KG-embedding training — deterministic corruption.

A KG-embedding trainer (TransE and descendants) consumes each positive
triple with K corrupted negatives (tail replaced by a random entity that
is NOT the true tail). At pipeline scale the sampling must be (a)
map-only — no shuffle, no RNG state — and (b) deterministic, so reruns
and resumed jobs emit identical training data (the E11 discipline
applied to sampling; same reasoning as dataops.tx_sample_hash).

Corruption k for edge (src, dst) over an id space [0, n):
    neg = (dst + 1 + (src*31 + dst*7 + k*17) mod (n-1)) mod n
The offset is drawn from [1, n-1], so neg == dst is impossible by
construction — no rejection loop, no branch, SQL-restatable verbatim.
(A hash in place of the linear mix works identically; the linear form is
used so the DuckDB oracle is the same one-line expression.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corrupt_tails(
    edges: DataFrame,
    n_entities: int,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(src, dst, neg_idx, neg_dst): K deterministic corruptions per edge.

    Requires integer node ids in [0, n_entities); string-keyed graphs map
    through a dictionary first (the standard embedding-training step).
    """
    if n_entities < 2:
        if n_entities == 0 and edges.isEmpty():
            # empty graph (an empty incremental delta): nothing to
            # corrupt is a valid answer, not a misconfiguration
            return edges.sparkSession.createDataFrame(
                [], "src long, dst long, neg_idx int, neg_dst long"
            )
        raise ValueError("need at least 2 entities to corrupt against")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ks = e.select(
        "src", "dst", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx")
    )
    offset = 1 + (
        F.col("src") * 31 + F.col("dst") * 7 + F.col("neg_idx") * 17
    ) % (n_entities - 1)
    return ks.withColumn(
        "neg_dst", (F.col("dst") + offset) % n_entities
    )
