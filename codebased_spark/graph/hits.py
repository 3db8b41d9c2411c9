"""HITS hubs & authorities — the second classic web-link centrality.

Kleinberg '99: authority(v) = normalized sum of hub scores over in-links,
hub(u) = normalized sum of authority scores over out-links, iterated.
PageRank ranks by endorsement flow; HITS separates pages that ARE good
sources (authorities) from pages that POINT at good sources (hubs) —
the pair a link-analysis stage attaches to the domain/page graph.

Same engineering discipline as graph/pagerank.py:
- FIXED iteration count keeps the operator SQL-expressible — the DuckDB
  oracle unrolls the identical rounds as chained CTEs, so the driver
  gate checks values, not shapes.
- L1 normalization (divide by the score sum) instead of the textbook L2:
  same fixpoint direction, but the normalizer is a plain SUM — exactly
  reproducible in SQL and cheaper than a sqrt-of-squares at every scale.
- The score vector is node-sized, never corpus-sized. Each half-round is
  ONE join + ONE groupBy-sum keyed by the opposite endpoint (the
  textbook skew case on hub pages — AQE skew-split applies); the
  normalizer is a driver-collected scalar per half-round, with the
  vector persisted per round and checkpoint-released at exit so repeated
  calls do not leak cache entries (the pagerank lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def _hits_driver_side(
    node_rows, edge_rows, n_iter, out_decimals, spark, node_col, id_type
):
    """Driver-side twin for vocabulary-sized graphs (same adaptive
    rationale as pagerank/cc): identical rounds in float64."""
    import math

    from pyspark.sql import types as T

    vs = [r[0] for r in node_rows]
    n = len(vs)
    hub = {v: 1.0 / n for v in vs}
    auth = dict(hub)

    def half(score_by_src, key_src=True):
        raw = {}
        for u, v in edge_rows:
            kin, kout = (u, v) if key_src else (v, u)
            if kin in score_by_src:
                raw[kout] = raw.get(kout, 0.0) + score_by_src[kin]
        total = sum(raw.values())
        if total == 0.0:
            return {v: 0.0 for v in vs}
        return {v: raw.get(v, 0.0) / total for v in vs}

    for _ in range(n_iter):
        auth = half(hub, key_src=True)
        hub = half(auth, key_src=False)
    scale = 10 ** out_decimals
    schema = T.StructType(
        [
            T.StructField(node_col, id_type),
            T.StructField("hub", T.DoubleType()),
            T.StructField("auth", T.DoubleType()),
        ]
    )
    rows = [
        (
            v,
            math.floor(hub[v] * scale + 0.5) / scale,
            math.floor(auth[v] * scale + 0.5) / scale,
        )
        for v in vs
    ]
    return spark.createDataFrame(rows, schema)


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    out_decimals: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(node, hub, auth) after `n_iter` L1-normalized HITS rounds.

    Round order is the standard one: authorities from the PREVIOUS hubs,
    then hubs from the NEW authorities. Nodes with no in-links get
    authority 0, no out-links hub 0. Adaptive like pagerank/cc: below
    `driver_threshold` nodes+edges the rounds run driver-side (two probe
    collects, zero iteration jobs).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if driver_threshold:
        np_ = nodes.select(node_col).limit(driver_threshold + 1).collect()
        if len(np_) <= driver_threshold:
            ep = e.limit(driver_threshold + 1).collect()
            if len(ep) <= driver_threshold:
                return _hits_driver_side(
                    np_, [tuple(r) for r in ep], n_iter, out_decimals,
                    nodes.sparkSession, node_col,
                    nodes.schema[node_col].dataType,
                )
    n = nodes.count()
    hub = nodes.select(F.col(node_col).alias("id"), (F.lit(1.0) / n).alias("s"))
    auth = hub
    to_release = []

    def _normalized(raw: DataFrame) -> DataFrame:
        # raw: (id, x) partial sums over joined scores; persist BEFORE the
        # scalar collect so the subsequent join reuses the materialized
        # vector instead of recomputing the whole lineage
        raw = raw.persist()
        to_release.append(raw)
        total = raw.agg(F.coalesce(F.sum("x"), F.lit(0.0)).alias("t")).collect()[0].t
        if total == 0.0:
            return nodes.select(F.col(node_col).alias("id"), F.lit(0.0).alias("s"))
        return nodes.select(F.col(node_col).alias("id")).join(
            raw, "id", "left"
        ).select("id", (F.coalesce("x", F.lit(0.0)) / total).alias("s"))

    for _ in range(n_iter):
        auth = _normalized(
            e.join(hub.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("s").alias("x"))
        )
        hub = _normalized(
            e.join(auth.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.sum("s").alias("x"))
        )
    out = (
        hub.withColumnRenamed("s", "_h")
        .join(auth.withColumnRenamed("s", "_a"), "id")
        .select(
            F.col("id").alias(node_col),
            round_stable(F.col("_h"), out_decimals).alias("hub"),
            round_stable(F.col("_a"), out_decimals).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    for df in to_release:
        df.unpersist()
    return out
