"""Hub-ablation resilience audit — component structure with and without
the top-degree hubs.

Web-graph robustness analysis (Albert/Barabási attack-tolerance): scale-
free link graphs shatter when a handful of hubs are removed. A KG
pipeline runs this audit to answer "does connectivity (and therefore
PageRank mass flow, crawl reachability, entity-linking context) hang off
a few mega-hosts?" — the structural cousin of the skew audit
(link/skew.py skew_report), one level up from key counts.

Scale shape: degree is one (node) aggregation over the symmetric edge
set; the hub set is a top-k over the NODE dimension (vocabulary-sized)
and is broadcast into the two anti-joins that drop hub-incident edges;
each scenario then runs the adaptive connected-components pass
(link/cc.py — driver union-find under threshold, distributed min-label
loop above) plus one (component) count aggregation. Nothing corpus-sized
is ever collected.

Nodes isolated BY the ablation (every edge was hub-incident) drop out of
the labeled set — n_nodes reports surviving connected nodes, so
(full.n_nodes - ablated.n_nodes - k) is the stranded-node count, a
deliberate part of the audit rather than a hidden detail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.link.cc import connected_components


def _summary(edges: DataFrame, scenario: str) -> DataFrame:
    comps = connected_components(edges).groupBy("comp").agg(
        F.count(F.lit(1)).alias("n")
    )
    return comps.agg(
        F.sum("n").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_components"),
        F.max("n").alias("largest"),
    ).select(F.lit(scenario).alias("scenario"), "n_nodes", "n_components", "largest")


def top_hubs(sym_edges: DataFrame, k: int) -> DataFrame:
    """The k highest-degree nodes of an already-symmetrized edge set,
    ties broken by min node id. orderBy().limit(k) compiles to
    TakeOrderedAndProject — per-partition heap + driver merge of k rows —
    instead of a global row_number window, which would funnel the whole
    node vocabulary through one partition's sort at 10^9 nodes."""
    deg = sym_edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return deg.orderBy(F.desc("d"), F.asc("node")).limit(k).select("node")


def hub_ablation(
    edges: DataFrame,
    k: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Two rows — ('full', ...) and ('ablated', ...) — each with
    (n_nodes, n_components, largest) of the symmetrized, self-loop-free
    graph; 'ablated' removes the k highest-degree nodes (ties broken by
    min node id) and every edge touching them."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    hubs = top_hubs(sym, k)
    ablated = sym.join(
        F.broadcast(hubs.withColumnRenamed("node", "src")), "src", "left_anti"
    ).join(
        F.broadcast(hubs.withColumnRenamed("node", "dst")), "dst", "left_anti"
    )
    return _summary(sym, "full").unionByName(_summary(ablated, "ablated"))
