"""Column profiling + sliding-window hourly anomaly screen."""

import datetime


def test_column_profile_nulls_distinct_minmax(spark, tmp_path):
    rows = [
        (1, "aa", "en", "web", 10),
        (2, None, "en", "web", 20),
        (3, "bb", "fr", None, 10),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import tx_column_profile

    got = {r.column_name: r for r in tx_column_profile(spark, str(tmp_path)).collect()}
    assert got["text"].n_nulls == 1 and got["text"].n_distinct == 2
    assert got["source"].n_nulls == 1 and got["source"].n_distinct == 1
    assert got["n_chars"].n_nulls == 0 and got["n_chars"].n_distinct == 2
    assert got["doc_id"].min_str == "1" and got["doc_id"].max_str == "3"
    assert all(r.n_rows == 3 for r in got.values())


def test_hourly_anomalies_flags_planted_spike(spark, tmp_path):
    # 1 event/hour for 30 hours, except hour 27 gets 10 events: with a
    # trailing-24 sum of ~33, 10*24=240 > 2*33 -> spike
    t0 = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    for h in range(30):
        n = 10 if h == 27 else 1
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=i), 1, "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_hourly_anomalies

    out = q_hourly_anomalies(spark, str(tmp_path)).collect()
    # hours 0..23 lack a full trailing window and are excluded
    assert len(out) == 6
    spikes = {
        int((r.hour_ts - t0).total_seconds() // 3600): r.is_spike for r in out
    }
    assert spikes[27] == 1
    assert spikes[26] == 0 and spikes[28] == 0
