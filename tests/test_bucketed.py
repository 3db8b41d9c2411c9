"""Bucketed co-located join: same result, no shuffle exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codebased_spark.sources.bucketed import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nodes = spark.range(10_000).select(
            F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("name")
        )
        edges = spark.range(40_000).select(
            (F.col("id") % 10_000).alias("dst"), F.lit("CALLS").alias("rel")
        )
        write_bucketed(nodes, "t_nodes_b", ["id"], n_buckets=8)
        write_bucketed(edges, "t_edges_b", ["dst"], n_buckets=8)
        n = spark.table("t_nodes_b")
        e = spark.table("t_edges_b")
        joined = e.join(n, e.dst == n.id)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: shuffle paid at write
        assert joined.count() == 40_000

        # equality with the plain (shuffling) join
        plain = edges.join(nodes, edges.dst == nodes.id)
        assert plain.count() == joined.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_nodes_b")
        spark.sql("DROP TABLE IF EXISTS t_edges_b")
