"""Exact nearest-rank length quantiles + cohort retention."""

import datetime


def test_length_quantiles_nearest_rank(spark, tmp_path):
    # en: values 10..100 step 10 (n=10) -> p25 = rank ceil(2.5)=3 -> 30,
    # p50 -> rank 5 -> 50, p75 -> rank 8 -> 80, p95 -> rank ceil(9.5)=10 -> 100
    rows = [(i, "en", (i + 1) * 10) for i in range(10)]
    rows += [(100 + i, "fr", 7) for i in range(3)]  # constant -> all quantiles 7
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import tx_length_quantiles

    got = {
        (r.lang, r.pct): r.n_chars_q
        for r in tx_length_quantiles(spark, str(tmp_path)).collect()
    }
    assert got[("en", 25)] == 30 and got[("en", 50)] == 50
    assert got[("en", 75)] == 80 and got[("en", 95)] == 100
    assert all(got[("fr", p)] == 7 for p in (25, 50, 75, 95))


def test_retention_cohorts_day_offsets(spark, tmp_path):
    t0 = datetime.datetime(2024, 3, 1, 12)

    def ev(eid, uid, days):
        return (eid, t0 + datetime.timedelta(days=days), uid, "view", 1.0, "{}")

    # users 1,2 start day 0; user 1 returns day 2; user 3 starts day 1
    rows = [ev(1, 1, 0), ev(2, 2, 0), ev(3, 1, 2), ev(4, 3, 1), ev(5, 2, 0)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_retention_cohorts

    got = {
        (str(r.cohort_date), r.day_offset): r.n_users
        for r in q_retention_cohorts(spark, str(tmp_path)).collect()
    }
    assert got[("2024-03-01", 0)] == 2
    assert got[("2024-03-01", 2)] == 1
    assert got[("2024-03-02", 0)] == 1
    assert ("2024-03-01", 1) not in got
