"""Salted join / aggregate: result equality with the unsalted plan, and
actual spread of hot keys over salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codebased_spark.link.skew import hot_keys, salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: key 'hot' 10_000 rows, 50 cold keys 20 rows each
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "HOT")] + [(f"c{i}", f"C{i}") for i in range(50)]
    return spark.createDataFrame(rows, ["k", "label"])


def test_hot_keys(skewed):
    hk = hot_keys(skewed, "k", min_count=1000)
    assert [r.k for r in hk.collect()] == ["hot"]


def test_salted_join_equals_plain(spark, skewed, dim):
    hk = hot_keys(skewed, "k", min_count=1000)
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, "k", hk, n_salts=8, salt_by="v").groupBy(
        "k", "label"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, skewed, dim):
    hk = hot_keys(skewed, "k", min_count=1000)
    hot_b = F.broadcast(hk.select("k", F.lit(True).alias("_is_hot")))
    f = skewed.join(hot_b, "k", "left").withColumn(
        "_salt",
        F.when(
            F.col("_is_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(8)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    spread = (
        f.where(F.col("k") == "hot").groupBy("_salt").count().collect()
    )
    assert len(spread) == 8  # hot key occupies all 8 salt slots
    assert max(r["count"] for r in spread) < 10_000 * 0.25


def test_salted_aggregate_equals_plain(spark, skewed):
    hk = hot_keys(skewed, "k", min_count=1000)
    plain = (
        skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("m"))
    )
    salted = salted_aggregate(
        skewed, "k", {"n": "count(1)", "s": "sum(v)", "m": "max(v)"},
        hk, n_salts=8, salt_by="v",
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_collect_set(spark, skewed):
    hk = hot_keys(skewed, "k", min_count=1000)
    plain = skewed.groupBy("k").agg(
        F.array_sort(F.collect_set(F.col("v") % 10)).alias("vs")
    )
    salted = salted_aggregate(
        skewed, "k", {"vs": "collect_set(v % 10)"}, hk, n_salts=8, salt_by="v"
    ).select("k", F.array_sort("vs").alias("vs"))
    a = {r.k: list(r.vs) for r in plain.collect()}
    b = {r.k: list(r.vs) for r in salted.collect()}
    assert a == b


def test_salted_aggregate_rejects_non_reaggregable(spark, skewed):
    hk = hot_keys(skewed, "k", min_count=1000)
    with pytest.raises(ValueError, match="not re-aggregable"):
        salted_aggregate(skewed, "k", {"a": "avg(v)"}, hk)


def test_salted_join_rejects_outer(spark):
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from codebased_spark.link.skew import hot_keys, salted_join

    facts = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
    dim = spark.createDataFrame(pd.DataFrame({"k": ["a"], "d": [10]}))
    hot = hot_keys(facts, "k", min_count=1)
    with pytest.raises(ValueError, match="outer"):
        salted_join(facts, dim, "k", hot, how="full")
    with pytest.raises(ValueError, match="outer"):
        salted_join(facts, dim, "k", hot, how="right")
