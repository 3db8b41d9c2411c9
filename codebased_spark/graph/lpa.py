"""Synchronous label propagation — community detection over the link graph.

Community structure is the standard coarse clustering a web KG runs over
its entity/domain graph (topic clusters, link farms, mirror families).
LPA (Raghavan et al. 2007) is the scalable choice: no objective to
optimize, one join+agg per round. This is the SYNCHRONOUS variant with a
fully deterministic vote — label(v) <- the most frequent label among v's
neighbors, ties broken by MIN label — so a fixed round count is
cross-engine value-checkable (the same fixed-k discipline as
graph/pagerank.py and graph/hits.py; async LPA's arbitrary update order
is not reproducible across engines).

Scale shape per round: one shuffle join frontier (labels keyed by node,
edges keyed by dst) + one (node, label) aggregation with map-side
combine + one window partitioned by node for the argmax. Labels are node
ids (int64) — no strings ever shuffle. Per-round persist with
checkpoint-release would follow the pagerank discipline for large round
counts; at the fixed k used here lineage stays shallow.

Isolated nodes never appear in the edge set and are skipped — callers
wanting them keep-their-own-label can union them back (documented rather
than hidden: at web scale the isolated set is the majority of a crawl
frontier and materializing it is a deliberate cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, community) after `rounds` synchronous LPA rounds over the
    symmetrized, self-loop-free edge set; initial label = node id."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    win = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select("node", F.col("label").alias("community"))
