"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the recurring join keys (url/doc hash for page-keyed joins,
entity id for graph joins) deserve bucketed layout: both sides written
with bucketBy(k, key) hash-partition their files identically, so later
equi-joins and aggregations on that key run with NO exchange — the
shuffle was paid once at write time and amortized over every downstream
query. This is the Spark-native analog of the reference's persistent
Kuzu store being pre-indexed by node id (docs/ARCHITECTURE.md:71-74).

Spark requires bucketed data to live in a catalog table (the metastore
records bucket spec); `write_bucketed` wraps that, and the plan test
asserts the exchange-free join (tests/test_bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a parquet catalog table bucketed (and optionally
    sorted) by the join key."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
