"""Triangle counting over the entity/link graph — cohesion analytics.

Triangles are the unit of clustering-coefficient / community analysis a
KG consumer runs over the materialized edge table (the densest motif
query the reference's edge-pattern joins build toward, SURVEY.md Q1/Q3).

Algorithm: canonical-orient every undirected edge (a < b), then the
standard two-join enumeration E(a,b) ⋈ E(b,c) ⋈ E(a,c) with a < b < c —
each triangle is produced exactly once. Scale note: orienting by node id
bounds each join key's fan-out by max out-degree under that orientation;
the production refinement for power-law graphs is to orient by
(degree, id) instead ("node-iterator++", Schank & Wagner 2005), which
bounds fan-out by O(sqrt(m)) — enable with order_by_degree=True (two
extra broadcast-sized degree joins, identical output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, order_by_degree: bool) -> DataFrame:
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    if not order_by_degree:
        return und
    # re-orient low-degree -> high-degree (ties by id): fan-out per key
    # drops from max-degree to O(sqrt(m)) on skewed graphs
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # no broadcast hint: deg is node-cardinality (10^9+ at web scale, which
    # would OOM a forced broadcast); AQE converts these to broadcast joins
    # automatically whenever deg is actually small
    da = deg.withColumnsRenamed({"n": "a", "d": "da"})
    db = deg.withColumnsRenamed({"n": "b", "d": "db"})
    j = und.join(da, "a").join(db, "b")
    keep = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(keep, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(keep, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangles(edges: DataFrame, order_by_degree: bool = False) -> DataFrame:
    """Each triangle once as (x, y, z) in the canonical orientation."""
    e = _canonical_edges(edges, order_by_degree)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )


def triangle_counts(edges: DataFrame, order_by_degree: bool = False) -> DataFrame:
    """(node, n_triangles) for every node in at least one triangle."""
    tri = triangles(edges, order_by_degree)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def clustering_coefficient(
    edges: DataFrame, order_by_degree: bool = False
) -> DataFrame:
    """Local clustering coefficient: 2*triangles / (deg * (deg - 1)).

    (node, degree, n_triangles, clustering) for every node of degree >= 2
    (the coefficient is undefined below that); nodes in no triangle get
    0.0. The ratio of two exact integers is bit-identical across engines;
    rounded to 4 decimals like every double column (util.round_stable).
    """
    from codebased_spark.util import round_stable

    und = _canonical_edges(edges, order_by_degree=False)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= 2)
    )
    tri = triangle_counts(edges, order_by_degree)
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        round_stable(
            (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double")
        ).alias("clustering"),
    )
