"""Temporal join operators Spark lacks as built-ins: as-of join and
range join, both expressed as compositions of equi-joins + windows so
Catalyst never falls back to a nested-loop / cartesian plan.

Reference analog: the reference resolves "latest state at time T"
questions driver-side per entity (endpoints.py history walk); here both
are single-shuffle distributed plans.

asof_join — union-tag method, the classic MPP formulation:
    tag right rows 0 and left rows 1, union on the key columns, ONE
    window per key ordered by (ts, side, tiebreak), and a running
    `last(payload, ignorenulls=True)` carries the latest right payload
    forward onto each left row. Exactly one shuffle (the key
    partitioning); no range predicate ever reaches the join, so there
    is no risk of the O(|L|x|R|) theta-join plan a naive
    `l.ts >= r.ts` condition produces. Within one key the window scan
    is sequential — inherent to as-of semantics (a running "latest so
    far") — so scale comes from key cardinality, which for event data
    (users, hosts, entities) is plentiful; a single pathological hot
    key degrades to its own sorted scan, not a cross product.

bucketed_range_join — interval join via bucketing:
    explode each interval into fixed-width time buckets (one row per
    bucket it overlaps), equi-join on the bucket, then re-check the
    exact BETWEEN predicate. Cost is |intervals| x (span/bucket) +
    |events|, all hash-partitioned; a naive theta join is
    |events| x |intervals|. Bucket width trades blowup vs join
    selectivity and is caller-chosen to be >= the typical interval
    span so each interval explodes to O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward-inclusive as-of join: each left row gains the payload of
    the LATEST right row with the same key and right_ts <= left_ts
    (nulls when no such row). Matches DuckDB's
    `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`.

    `tiebreak`: right column ordering ties at equal (key, ts) — the row
    with the LARGEST tiebreak wins, making the result deterministic even
    with duplicate right timestamps. Defaults to the first payload col.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    tiebreak = tiebreak or right_payload[0]

    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload)
            + ">"
        )
        .alias("_payload"),
        lrow,
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
    )
    # right rows (side 0) sort BEFORE left rows at equal ts -> inclusive;
    # among equal-ts right rows the largest tiebreak is scanned last and
    # therefore wins the running last().
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols: list[Column] = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return matched.select(*out_cols)


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Inner range join: event rows x interval rows where
    event_ts BETWEEN start_col AND end_col (inclusive both ends),
    via day-bucket equi-join — never a nested-loop plan. Overlapping
    intervals each match (one output row per (event, interval) pair).
    Each interval explodes to ceil(span/1day) bucket rows, so the
    bucketed side stays |intervals| x days — tiny next to the corpus.
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.col(start_col)),
                F.date_trunc("DAY", F.col(end_col)),
                F.expr("interval 1 day"),
            )
        ),
    )
    ev = events.withColumn("_bucket", F.date_trunc("DAY", F.col(event_ts)))
    joined = ev.join(iv, on="_bucket", how="inner").where(
        (F.col(event_ts) >= F.col(start_col)) & (F.col(event_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")
