"""Degree assortativity and directed triad/motif census.

Web-graph structure diagnostics a crawl-quality / spam model consumes
alongside PageRank and the bow-tie decomposition (reference analog: the
stats scan S12 reports per-type node/edge counts; these are the
next-order structural summaries — Newman 2002 assortativity, the
Holland-Leinhardt dyad census, and the two directed-triangle motifs
from Milo et al.'s triad significance profile).

Exactness contract (house rule): every emitted count is an exact BIGINT
reproducible in ANSI SQL, and the one double column (the assortativity
coefficient) is derived from those pinned integers by a single IEEE
divide + floor-round, so Spark and DuckDB agree bit-for-bit.

Scale notes:
- assortativity is two narrow shuffles: a degree groupBy keyed by node
  and a single-row global aggregate of per-edge products. The join of
  edges against the degree table is a standard key join; at web scale
  the degree side is the node table (small relative to edges) and AQE
  broadcast-joins it when it fits.
- the triad census is edge-edge self-joins. Unconstrained wedge joins
  explode on hub nodes, so callers bound fan-out with ``max_degree``
  (default 64, same guard as linkpred/cocitation): nodes above the cap
  are dropped from WEDGE CENTERS before the join — the standard
  high-degree-vertex mitigation for motif counting (drop-or-sample
  hubs), documented in the emitted `max_degree` column so downstream
  readers know the census scope. With the cap, shuffle volume is
  O(E * max_degree) worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Single-row degree-mixing summary of the UNDIRECTED simple graph.

    Columns: m_ordered (2E ordered endpoint pairs), sum_jk, sum_j,
    sum_j2 (Newman's sufficient statistics, exact BIGINTs) and
    assortativity = (m*sum_jk - sum_j^2) / (m*sum_j2 - sum_j^2) rounded
    to 4 decimals. Degenerate regular graphs (denominator 0) emit NULL.
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("ja"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("jb"))
    per_edge = und.join(da, "a").join(db, "b")
    stats = per_edge.agg(
        (2 * F.count(F.lit(1))).alias("m_ordered"),
        (2 * F.sum(F.col("ja") * F.col("jb"))).alias("sum_jk"),
        F.sum(F.col("ja") + F.col("jb")).alias("sum_j"),
        F.sum(F.col("ja") * F.col("ja") + F.col("jb") * F.col("jb")).alias(
            "sum_j2"
        ),
    )
    num = F.col("m_ordered") * F.col("sum_jk") - F.col("sum_j") * F.col("sum_j")
    den = F.col("m_ordered") * F.col("sum_j2") - F.col("sum_j") * F.col("sum_j")
    return stats.select(
        "m_ordered",
        "sum_jk",
        "sum_j",
        "sum_j2",
        F.when(
            den != 0, round_stable(num.cast("double") / den.cast("double"))
        ).alias("assortativity"),
    )


def triad_census(
    edges: DataFrame, n_nodes: int, max_degree: int = 64
) -> DataFrame:
    """Single-row dyad + directed-triangle census of the simple digraph.

    Columns (all exact BIGINTs): n_nodes, n_edges, n_mutual_dyads,
    n_asym_dyads, n_null_dyads (Holland-Leinhardt MAN census), and the
    two triangle motifs as ORDERED-triple counts — n_cycle_triples
    (a->b->c->a; 3 rotations per cyclic triangle, so divisible by 3) and
    n_transitive_triples (a->b, b->c, a->c) — plus the max_degree census
    scope. Nodes whose total degree exceeds ``max_degree`` are excluded
    from wedge centers (position b) before the triangle joins.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    n_edges = e.count()
    fwd = e.select("src", "dst")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # dyads keyed a<b: both orientations folded onto the canonical pair
    pair_dirs = (
        fwd.unionByName(rev)
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_dirs"))
    )
    dyads = pair_dirs.agg(
        F.sum(F.when(F.col("n_dirs") == 2, 1).otherwise(0)).alias("n_mutual"),
        F.sum(F.when(F.col("n_dirs") == 1, 1).otherwise(0)).alias("n_asym"),
    ).collect()[0]
    n_mutual = int(dyads["n_mutual"] or 0)
    n_asym = int(dyads["n_asym"] or 0)
    n_null = n_nodes * (n_nodes - 1) // 2 - n_mutual - n_asym
    # hub guard: wedge centers capped by total degree
    deg = (
        fwd.unionByName(rev)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= max_degree)
        .select(F.col("src").alias("center"))
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).join(
        deg, F.col("b") == F.col("center")
    ).select("a", "b")
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedge = ab.join(bc, "b").where(F.col("c") != F.col("a"))
    close_cyc = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    close_tra = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    n_cyc = wedge.join(close_cyc, ["c", "a"]).count()
    n_tra = wedge.join(close_tra, ["a", "c"]).count()
    e.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                n_mutual,
                n_asym,
                n_null,
                n_cyc,
                n_tra,
                max_degree,
            )
        ],
        (
            "n_nodes long, n_edges long, n_mutual_dyads long, "
            "n_asym_dyads long, n_null_dyads long, n_cycle_triples long, "
            "n_transitive_triples long, max_degree long"
        ),
    )
