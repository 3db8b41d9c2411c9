"""Neighborhood-based link prediction over the materialized link graph.

KG completion's first-line scorer: for every non-adjacent node pair that
shares at least one neighbor, emit common-neighbor count, neighborhood
Jaccard, and a resource-allocation score (Zhou/Lu/Zhang 2009 — the
rational-arithmetic cousin of Adamic-Adar, chosen here because its
per-neighbor term 1/deg(c) can be computed as an exact scaled integer,
so the distributed sum is order-independent and oracle-hash-stable,
unlike a float ln() sum). Reference analog: the edge-pattern joins the
reference exposes for relationship discovery (SURVEY.md Q1/Q3) — this
is the same two-hop wedge join, aggregated into ranking scores.

Scale shape: wedge enumeration costs sum_c C(deg(c), 2) — quadratic in
hub degree, so hubs above ``max_degree`` are excluded from the wedge
join (the co-citation out-degree cap pattern, extract/anchors.py). At
web scale the cap is the difference between O(m·d_max) and O(m·cap);
excluded hubs (stopword-like super-connectors) add noise, not signal,
to neighborhood similarity. All joins shuffle on node ids; degree table
is node-cardinality (no forced broadcast — AQE downgrades to broadcast
when it is actually small). Existing edges are removed with a single
anti-join on the canonical pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1/deg(c) is emitted as RA_SCALE // deg(c): an exact integer, so the
# aggregate sum is associative-exact (no float ordering flake)
RA_SCALE = 10000


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical (a < b) undirected edge set from a directed edge list."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def link_prediction(edges: DataFrame, max_degree: int = 64) -> DataFrame:
    """Score non-adjacent pairs with >=1 shared neighbor.

    Returns (src, dst, n_common, ra_scaled, jaccard):
      n_common  — #shared neighbors (wedges through capped hubs excluded)
      ra_scaled — sum over shared c of RA_SCALE // deg(c)  (resource
                  allocation, exact integer)
      jaccard   — n_common / (deg(src)+deg(dst)-n_common), rounded to
                  4 decimals (single division — deterministic)
    """
    und = undirected_edges(edges)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))

    # wedges through non-hub centers c: (a, b, deg(c)) with a < b
    capped = adj.join(deg, "node").where(F.col("d") <= max_degree)
    x = capped.select(
        F.col("node").alias("c"), F.col("nb").alias("a"), F.col("d").alias("dc")
    )
    y = capped.select(F.col("node").alias("c"), F.col("nb").alias("b"))
    wedges = x.join(y, "c").where(F.col("a") < F.col("b"))

    cand = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.expr(f"{RA_SCALE} div dc")).alias("ra_scaled"),
    )
    # drop pairs that are already edges (predict NEW links only)
    cand = cand.join(und, ["a", "b"], "left_anti")

    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    out = cand.join(da, "a").join(db, "b")
    union_size = F.col("da") + F.col("db") - F.col("n_common")
    jac = F.floor(F.col("n_common") / union_size * 10000 + F.lit(0.5)) / 10000
    return out.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        "n_common",
        "ra_scaled",
        jac.alias("jaccard"),
    )
