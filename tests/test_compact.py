"""Small-file compaction sink (sinks/compact.py)."""

from __future__ import annotations

import pytest

from codebased_spark.sinks.compact import CompactionStats, compact_parquet, _census


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(64).write.parquet(src)
    n_before, total = _census(src)
    assert n_before == 64

    stats = compact_parquet(spark, src, dst, target_bytes=total)
    assert isinstance(stats, CompactionStats)
    assert stats.files_before == 64 and stats.target_files == 1
    assert stats.files_after == 1

    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert sorted(out.columns) == ["id", "k"]
    assert out.selectExpr("sum(id) AS s").collect()[0].s == sum(range(10_000))


def test_compaction_respects_target_size(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(50_000).repartition(32).write.parquet(src)
    _, total = _census(src)
    # ask for ~4 files worth of target size
    stats = compact_parquet(spark, src, dst, target_bytes=max(1, total // 4))
    assert 2 <= stats.files_after <= 8  # ceil rounding, but far below 32
    assert spark.read.parquet(dst).count() == 50_000


def test_compaction_refuses_in_place(spark, tmp_path):
    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError):
        compact_parquet(spark, src, src)
