"""Iceberg table adapter with a graceful parquet+manifest fallback.

The north-star deployment stores pages/nodes/edges as Iceberg tables
(snapshot commits, time travel, expire_snapshots). This sandbox has no
Iceberg runtime jar, so the engine ships BOTH paths behind one API:

- `iceberg_available(spark)`: true iff the Iceberg Spark extension is on
  the session (catalog implementation configured AND the runtime class
  loads). On a production cluster this is
  `--packages org.apache.iceberg:iceberg-spark-runtime-...` plus a
  catalog conf; nothing in this module needs code changes there.
- `write_table` / `read_table`: route to `catalog.db.table` Iceberg DDL
  when available, else to the repo's parquet + manifest-last layout
  (graph/manifest.py discipline: a table directory becomes visible only
  after a complete write).

The semantics the engine RELIES on are the same in both modes and are
what the tests pin on the fallback: idempotent overwrite, atomic
visibility (write to staging, rename last), and readable round-trip.
The Iceberg branch adds snapshot history on top; the fallback documents
where each call maps (comments inline), so swapping the jar in is a
config change, not a port.

Reference analog: S9's batched sink + manifest-last commit
(SURVEY.md §2.1) — the same commit discipline Iceberg implements
natively with snapshot pointers.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND the runtime class
    resolves on the JVM classpath."""
    conf = spark.conf
    has_catalog = any(
        conf.get(k, None)
        for k in (
            "spark.sql.catalog.spark_catalog",
            "spark.sql.catalog.iceberg",
        )
    )
    if not has_catalog:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — any resolution failure means no jar
        return False


def write_table(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
) -> str:
    """Write `df` to `target`.

    Iceberg mode: `target` is a catalog table name — `writeTo(...)
    .createOrReplace()` (one snapshot commit; time travel for free).
    Fallback: `target` is a directory — write to a staging dir then
    rename into place, so readers never see a PARTIAL table (the
    manifest-last rule; an Iceberg commit is the same swap done on a
    metadata pointer). Overwriting an existing dir takes two renames and
    a concurrent reader in that instant gets FileNotFound rather than
    partial data — see the inline note. Returns the path/name written."""
    if iceberg_available(spark) and "/" not in target:
        w = df.writeTo(target)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return target
    if mode == "append" and os.path.exists(target):
        # parquet append is per-file atomic already
        df.write.mode("append").parquet(target)
        return target
    staging = f"{target}.__staging_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(target):
        # Swap: move the live dir aside (one rename), promote staging (one
        # rename), then delete the old generation. Readers see either the
        # old or the new COMPLETE table — never a partial one — but POSIX
        # has no atomic directory exchange, so between the two renames
        # there is a brief window where `target` does not exist and a
        # concurrent open gets FileNotFound (an Iceberg catalog closes
        # this window by swapping a metadata pointer instead; that is the
        # mode used whenever a runtime is present). If the second rename
        # fails, the old generation is restored so a crash can never leave
        # the table missing with data stranded in .__old_*.
        old = f"{target}.__old_{uuid.uuid4().hex[:8]}"
        os.rename(target, old)
        try:
            os.rename(staging, target)
        except BaseException:
            os.rename(old, target)
            raise
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, target)
    return target


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read a table written by write_table (either mode)."""
    if iceberg_available(spark) and "/" not in target:
        return spark.read.table(target)
    return spark.read.parquet(target)
