"""MERGE INTO semantics + late-data (watermark) audit."""

import datetime


def test_merge_actions(spark, tmp_path):
    # ids 0..21: 0 -> update (0%7==0) AND insert source (0%10==0);
    # 1 -> stale update (1%13==1, ts 1-10 < 1); 3 -> tombstone (3%11==3);
    # 14 -> update (14%7==0, ts 64 > 14)
    rows = [(i, "t", "en", "src0", 10) for i in range(22)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_merge_upsert

    got = {r.entity_id: r for r in kg_merge_upsert(spark, str(tmp_path)).collect()}
    assert got[7].action == "updated" and got[7].name == "upd_7"
    assert got[1].action == "kept" and got[1].name == "name_1"  # stale loses
    assert got[3].action == "deleted" and got[3].name is None
    assert got[22].action == "inserted" and got[22].name == "new_22"  # 0+22
    assert got[2].action == "kept" and got[2].name == "name_2"
    # every base id + inserted ids present exactly once
    assert len(got) == 22 + 3  # inserts from ids 0,10,20


def test_late_events_running_watermark(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, minutes, typ="view"):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 1, typ, 1.0, "{}")

    # arrival order: t=0, t=30, then a very late t=5 (25 min behind),
    # then t=31 (on time), then slightly-late t=25 (6 min behind, ok)
    rows = [ev(1, 0), ev(2, 30), ev(3, 5), ev(4, 31), ev(5, 25)]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_late_events

    (r,) = q_late_events(spark, str(tmp_path)).collect()
    assert r.n_events == 5
    assert r.n_late == 1  # only the 25-min-behind event crosses 10 min
    assert r.max_behind_us == 25 * 60 * 1_000_000
