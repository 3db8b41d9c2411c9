#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values. Run: python tools/check_oracle.py
"""

from __future__ import annotations

import datetime
import math
import sys
from decimal import Decimal

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from codebased_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    if len(sys.argv) > 2:  # optional comma-separated name filter
        keep = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = sorted(rel.columns)
            # Driver-parity type gate: the driver's hash is type-sensitive
            # (Arrow canonicalization), so HUGEINT/DECIMAL oracle columns fail
            # its hash even when every value equals the Spark int64/double.
            # This local replica stringifies through Python ints and cannot
            # see that difference — so reject the types outright.
            bad_types = {
                c: str(ty)
                for c, ty in zip(rel.columns, rel.types)
                if "HUGEINT" in str(ty) or "DECIMAL" in str(ty)
            }
            if bad_types:
                print(f"FAIL  {name}: driver-divergent oracle types {bad_types}"
                      " (CAST to BIGINT/DOUBLE)")
                failures += 1
                continue
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        if scols != dcols:
            print(f"FAIL  {name}: schema mismatch spark={scols} duckdb={dcols}")
            failures += 1
            continue
        a = norm_rows(sdf.columns, srows)
        b = norm_rows(rel.columns, drows)
        if len(a) != len(b):
            print(f"FAIL  {name}: row count spark={len(a)} duckdb={len(b)}")
            failures += 1
            continue
        if a != b:
            diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
            diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
            print(f"FAIL  {name}: value mismatch\n  spark-only: {diff_a}\n  duck-only:  {diff_b}")
            failures += 1
            continue
        print(f"OK    {name}: {len(a)} rows match")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
