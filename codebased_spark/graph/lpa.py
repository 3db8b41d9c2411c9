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


def community_modularity(
    edges: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact-integer modularity decomposition of the LPA communities.

    Newman modularity Q = sum_c [ e_c/m - (d_c/2m)^2 ] over communities c,
    with m undirected edges, e_c internal edges, d_c community degree sum.
    Both engines evaluate Q's per-community term as the exact BIGINT
    numerator over the shared denominator 4*m^2:

        q_num_c = 4*m*e_c - d_c^2 = 2*m*(2*e_c) - d_c^2

    so the value check is bit-exact — no transcendental, no float ratio
    (the same exact-numerator discipline as kg_entity_pmi's `lift` and
    the log2-quantized classifier). Q itself = sum(q_num)/(4*m^2),
    derivable by any consumer.

    Scale shape: LPA's per-round join+agg (see label_propagation), then
    two label-attach joins on the symmetric edge set (labels are node-id
    keyed — broadcastable when the vocabulary is small, shuffle-join
    otherwise, Catalyst/AQE picks), one (community) aggregation each for
    internal edges / degree mass / node count, and a broadcast of the
    single-row global edge-count aggregate. No driver-side collect; the
    global m arrives via a broadcast cross join of a 1-row DataFrame.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = label_propagation(edges, rounds, src_col, dst_col)
    # sym holds both directions of every undirected edge -> m = |sym| / 2
    m_row = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("m_edges"))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    la = labels.select(F.col("node").alias("src"), F.col("community"))
    lb = labels.select(
        F.col("node").alias("dst"), F.col("community").alias("community_b")
    )
    internal = (
        sym.join(la, "src")
        .join(lb, "dst")
        .where(F.col("community") == F.col("community_b"))
        .groupBy("community")
        # both directions counted -> internal_sym = 2 * e_c
        .agg(F.count(F.lit(1)).alias("internal_sym"))
    )
    mass = (
        deg.join(labels, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("degree").alias("degree_sum"),
        )
    )
    out = (
        mass.join(internal, "community", "left")
        .withColumn("internal_sym", F.coalesce("internal_sym", F.lit(0)))
        .crossJoin(F.broadcast(m_row))
    )
    return out.select(
        "community",
        "n_nodes",
        F.expr("internal_sym div 2").alias("internal_edges"),
        "degree_sum",
        (
            F.lit(2) * F.col("m_edges") * F.col("internal_sym")
            - F.col("degree_sum") * F.col("degree_sum")
        ).alias("q_num"),
        "m_edges",
    )
