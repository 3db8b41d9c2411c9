#!/usr/bin/env python
"""spark-submit entry point for table maintenance — the periodic OPTIMIZE /
VACUUM job every large lake table needs between pipeline runs.

Composes the engine's maintenance operators over a pages table:

    retention vacuum        keep each url's latest capture plus captures
                            within --retention seconds of it; older
                            superseded captures are dropped (the
                            expire_snapshots planner kg_vacuum_plan, applied)
    length-clustered rewrite global sort by (n_chars-proxy, url) so zone
                            maps become selective (kg_zone_maps' layout)
    small-file compaction   sinks/compact.py: ceil(bytes/target) files,
                            written to a NEW directory (manifest-last swap)
    zone-map sidecar        per-output-file min/max of the cluster column —
                            the column bounds Iceberg/Delta keep in manifests
    integrity check         order-independent Merkle bucket digests of the
                            retained rows BEFORE and AFTER the rewrite must
                            match bucket-for-bucket: maintenance must never
                            change table CONTENT, only layout. The digest
                            gate runs on the staged rewrite; maintained/ is
                            only swapped in when digests are equal, so a
                            mismatch leaves the live table untouched

Outputs under --out:
    maintained/   compacted, clustered pages parquet
    zonemap/      (file_name, n_rows, min_len, max_len) parquet
    report line   one JSON line on stdout (counts, bytes, digests_equal)

Usage:
    spark-submit --py-files codebased_spark.zip jobs/maintain_table.py \\
        --pages /path/pages_parquet --out /tmp/maint \\
        [--retention 86400] [--target-mb 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _content_digests(df, text_col: str, n_buckets: int = 64):
    """Order-independent per-bucket content digest (the kg_merkle_diff
    shape): md5 over the key-sorted row-hash concat, keyed by url hash."""
    from pyspark.sql import functions as F

    return (
        df.select(
            (F.abs(F.xxhash64("url")) % n_buckets).alias("bucket"),
            F.col("url").alias("k"),
            F.md5(F.concat_ws("\x01", "url", text_col)).alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("k", "h"))),
                        lambda s: s["h"],
                    ),
                )
            ).alias("digest")
        )
    )


def main(argv: list[str] | None = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="parquet with (url, warc_ts, text, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--retention", type=int, default=86400,
                    help="seconds of superseded-capture history to keep")
    ap.add_argument("--target-mb", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from codebased_spark.session import get_spark
    from codebased_spark.sinks.compact import compact_parquet

    spark = get_spark("maintain-table", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(args.pages)
    n_input = pages.count()

    # 1) retention vacuum: one url-keyed exchange serves window + filter
    w = Window.partitionBy("url")
    retained = (
        pages.withColumn("_max_ts", F.max("warc_ts").over(w))
        .where(
            F.col("warc_ts")
            >= F.col("_max_ts") - F.expr(f"INTERVAL {args.retention} SECONDS")
        )
        .drop("_max_ts")
    )
    retained = retained.persist()
    n_retained = retained.count()

    before = {r.bucket: r.digest
              for r in _content_digests(retained, "text").collect()}

    # 2) length-clustered staging write (zone maps get selective), then
    # 3) compaction into a SECOND staging dir. maintained/ is only renamed
    #    into place after the digest check passes (manifest-last: a digest
    #    mismatch must leave the live path untouched, not already swapped)
    staging = os.path.join(args.out, "_staging")
    compacted = os.path.join(args.out, "_compacted")
    final = os.path.join(args.out, "maintained")
    (
        retained.withColumn("_len", F.length("text"))
        .repartitionByRange(max(args.cpus, 1), "_len", "url")
        .sortWithinPartitions("_len", "url")
        .drop("_len")
        .write.mode("overwrite")
        .parquet(staging)
    )
    stats = compact_parquet(
        spark, staging, compacted, target_bytes=args.target_mb << 20
    )

    candidate = spark.read.parquet(compacted)
    after = {r.bucket: r.digest
             for r in _content_digests(candidate, "text").collect()}
    digests_equal = before == after

    if digests_equal:
        # promote: candidate becomes maintained/ (restore-guarded swap if a
        # previous generation exists — same discipline as sources/iceberg)
        import shutil
        import uuid

        if os.path.exists(final):
            old = f"{final}.__old_{uuid.uuid4().hex[:8]}"
            os.rename(final, old)
            try:
                os.rename(compacted, final)
            except BaseException:
                os.rename(old, final)
                raise
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(compacted, final)

        maintained = spark.read.parquet(final)
        # 4) zone-map sidecar over the ACTUAL output files
        zonemap = (
            maintained.select(
                F.input_file_name().alias("file_name"),
                F.length("text").alias("len"),
            )
            .groupBy("file_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("len").alias("min_len"),
                F.max("len").alias("max_len"),
            )
        )
        zonemap.write.mode("overwrite").parquet(os.path.join(args.out, "zonemap"))

    report = {
        "n_input": n_input,
        "n_retained": n_retained,
        "n_vacuumed": n_input - n_retained,
        "files_before": stats.files_before,
        "files_after": stats.files_after,
        "bytes_total": stats.bytes_total,
        "digests_equal": digests_equal,
    }
    print(json.dumps(report))
    retained.unpersist()
    if not digests_equal:
        raise SystemExit("maintenance changed table content — aborting swap")


if __name__ == "__main__":
    main()
