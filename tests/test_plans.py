"""Physical-plan contracts: the optimizations we rely on at 100 TB must
actually appear in the executed plans (broadcast joins, parquet filter
pushdown, column pruning, whole-stage codegen, no Python UDF in JVM-only
operators)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_broadcast(spark):
    from codebased_spark.graph.queries import q_top_customers

    p = plan(q_top_customers(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anti_join_filter_pushdown(spark):
    from codebased_spark.graph.queries import q_customers_no_orders

    df = q_customers_no_orders(spark, SF)
    p = plan(df)
    # the o_totalprice predicate must reach the orders parquet scan
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in p


def test_column_pruning_on_scan(spark):
    from codebased_spark.dedup.exact import exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(exact_dedup(docs))
    # only doc_id and text are read, not lang/source/n_chars
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_quality_scoring_stays_jvm(spark):
    from codebased_spark.textops.quality import doc_quality

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(doc_quality(docs))
    # higher-order functions run as interpreted JVM expressions (no
    # codegen), but must never fall back to Python evaluation
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_mention_scan_is_arrow_not_rowwise(spark):
    from codebased_spark.extract.mentions import with_mentions

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(with_mentions(docs.selectExpr("text"), ["spark"], "text"))
    assert "ArrowEvalPython" in p  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in p


def test_minhash_signature_stays_jvm(spark):
    from codebased_spark.dedup.minhash import with_minhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(with_minhash(docs, k=8))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
