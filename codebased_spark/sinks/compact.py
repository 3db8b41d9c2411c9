"""Small-file compaction — the table-maintenance job a 100 TB lake needs.

Every incremental pipeline (graph/manifest.py's bucket overwrites, the
curation job's chunk writes) accretes small parquet files: a 10^12-row
table touched by thousands of micro-batches ends up with millions of
KB-sized files, and scan planning + open() overhead dominates reads long
before data volume does. The standing fix is a periodic rewrite of each
partition into ~target-size files — what Iceberg exposes as
`rewrite_data_files` and Delta as OPTIMIZE; this module is the plain-
parquet equivalent, written manifest-last-style (new directory, then
swap) so a crashed compaction never corrupts the live table.

Reference analog: the batched sink discipline (SURVEY.md S9) — bounded
write units with an atomic commit point at the end.

Scale notes: `coalesce` (default) merges partitions WITHOUT a shuffle —
the right tool when the goal is purely fewer files; it can leave files
skewed if the input partitions were. `repartition` (shuffle=True)
rebalances at the cost of a full shuffle — worth it when downstream
scans care about uniform splits. Both are per-call choices, not
hardcoded. The file census uses the driver-side filesystem listing,
which is metadata-only (no data read)."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    target_files: int


def _census(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, fn))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 256 << 20,
    shuffle: bool = False,
) -> CompactionStats:
    """Rewrite `src_dir` into `dst_dir` with ceil(total/target_bytes)
    files (at least 1). `dst_dir` must differ from `src_dir`: the caller
    swaps directories (or repoints its manifest) AFTER this returns —
    the manifest-last commit discipline, so a mid-compaction crash
    leaves the live table untouched."""
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("compact_parquet writes to a NEW directory; "
                         "swap after it returns (manifest-last commit)")
    files_before, bytes_total = _census(src_dir)
    target = max(1, math.ceil(bytes_total / target_bytes))
    df = spark.read.parquet(src_dir)
    sized = df.repartition(target) if shuffle else df.coalesce(target)
    sized.write.mode("overwrite").parquet(dst_dir)
    files_after, _ = _census(dst_dir)
    return CompactionStats(files_before, files_after, bytes_total, target)
