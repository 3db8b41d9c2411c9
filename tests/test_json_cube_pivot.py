"""JSON props parsing, CUBE grouping sets, declared-values pivot."""

import datetime


def _events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_props_parse_buckets(spark, tmp_path):
    t = datetime.datetime(2024, 1, 1)
    _events(
        spark,
        tmp_path,
        [
            (1, t, 1, "click", 1.0, '{"k": 12}'),
            (2, t, 1, "click", 1.0, '{"k": 22}'),
            (3, t, 1, "view", 1.0, '{"k": 7}'),
        ],
    )
    from codebased_spark.dataops import q_props_parse

    got = {
        (r.event_type, r.k_bucket): (r.n_events, r.sum_k)
        for r in q_props_parse(spark, str(tmp_path)).collect()
    }
    assert got[("click", 2)] == (2, 34)
    assert got[("view", 7)] == (1, 7)


def test_cube_gid_levels(spark, tmp_path):
    t = datetime.datetime(2024, 1, 1)
    _events(
        spark,
        tmp_path,
        [
            (1, t, 1, "click", 1.0, "{}"),
            (2, t + datetime.timedelta(days=1), 1, "click", 1.0, "{}"),
            (3, t, 1, "view", 1.0, "{}"),
        ],
    )
    from codebased_spark.dataops import q_cube_events

    rows = q_cube_events(spark, str(tmp_path)).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # grand total: one row, gid 3
    assert len(by_gid[3]) == 1 and by_gid[3][0].n_events == 3
    # per-type subtotals (day nulled): click=2, view=1
    typ = {r.event_type: r.n_events for r in by_gid[1]}
    assert typ == {"click": 2, "view": 1}
    # per-day subtotals (type nulled): day1=2, day2=1
    assert sorted(r.n_events for r in by_gid[2]) == [1, 2]
    # finest level: 3 combos
    assert len(by_gid[0]) == 3


def test_pivot_declared_values(spark, tmp_path):
    rows = [
        (1, "t", "en", "src0", 1),
        (2, "t", "en", "src1", 1),
        (3, "t", "fr", "src0", 1),
        (4, "t", "en", "src9", 1),  # undeclared source -> not a column
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import q_pivot_lang_source

    out = {r.lang: r for r in q_pivot_lang_source(spark, str(tmp_path)).collect()}
    assert out["en"].src0 == 1 and out["en"].src1 == 1 and out["en"].src2 == 0
    assert out["fr"].src0 == 1 and out["fr"].src1 == 0
    assert "src9" not in out["en"].asDict()
