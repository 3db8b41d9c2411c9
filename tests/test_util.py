"""util helpers: stable rounding, long-key sanitization."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from codebased_spark.util import round_stable, sanitize_long_key


def test_round_stable_boundary(spark):
    # 0.62845 is stored as 0.62844999...; decimal HALF_UP says 0.6285 but
    # both engines must agree on the binary value -> 0.6284
    df = spark.range(1).select(
        round_stable(F.lit(0.62845)).alias("a"),
        round_stable(F.lit(0.5)).alias("b"),
        round_stable(F.lit(0.123449)).alias("c"),
    )
    row = df.head()
    assert row.a == 0.6284
    assert row.b == 0.5
    assert row.c == 0.1234


def test_sanitize_long_key(spark):
    long = "d3.select.append.attr" * 10  # 210 chars
    df = spark.createDataFrame([(long,), ("short",)], ["k"]).select(
        sanitize_long_key(F.col("k")).alias("s"), "k"
    )
    rows = {r.k: r.s for r in df.collect()}
    assert rows["short"] == "short"
    got = rows[long]
    assert len(got) == 90 + 3 + 8
    assert got == long[:90] + "..." + hashlib.md5(long.encode()).hexdigest()[:8]
