"""Iceberg adapter (sources/iceberg.py): fallback semantics the engine
relies on, pinned without the runtime jar."""

from __future__ import annotations

import os


def test_iceberg_not_available_in_sandbox(spark):
    from codebased_spark.sources.iceberg import iceberg_available

    assert iceberg_available(spark) is False


def test_write_read_roundtrip_and_atomic_overwrite(spark, tmp_path):
    from codebased_spark.sources.iceberg import read_table, write_table

    target = str(tmp_path / "tbl")
    df1 = spark.range(10).withColumnRenamed("id", "v")
    write_table(spark, df1, target)
    assert read_table(spark, target).count() == 10

    # overwrite replaces wholesale and leaves no staging/old debris
    df2 = spark.range(3).withColumnRenamed("id", "v")
    write_table(spark, df2, target)
    got = sorted(r.v for r in read_table(spark, target).collect())
    assert got == [0, 1, 2]
    debris = [d for d in os.listdir(tmp_path)
              if "__staging" in d or "__old" in d]
    assert debris == []


def test_append_mode_accumulates(spark, tmp_path):
    from codebased_spark.sources.iceberg import read_table, write_table

    target = str(tmp_path / "tbl2")
    write_table(spark, spark.range(4).withColumnRenamed("id", "v"), target)
    write_table(spark, spark.range(2).withColumnRenamed("id", "v"), target,
                mode="append")
    assert read_table(spark, target).count() == 6
