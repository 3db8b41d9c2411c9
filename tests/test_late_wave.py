"""Post-closing wave: table column typing, survivor policies."""


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_column_types_majority_rule(spark, tmp_path):
    _write_docs(spark, tmp_path, [(6, "body", "en", "src0", 44)])

    from codebased_spark.dataops import kg_table_column_types

    got = {r.col_idx: (r.header, r.n_numeric, r.col_type)
           for r in kg_table_column_types(spark, str(tmp_path)).collect()}
    assert got[0] == ("name", 0, "text")
    assert got[1] == ("lang", 0, "text")
    assert got[2] == ("chars", 2, "numeric")


def test_survivor_policies_disagree_on_longest(spark, tmp_path):
    # one template group: ids 0,15,30 (all %5==0 AND %3==0 -> template
    # 0); doc 15 is longest -> keep_first=0, keep_longest=15
    _write_docs(spark, tmp_path, [
        (0, "x", "en", "src0", 10),
        (15, "y", "en", "src1", 99),
        (30, "z", "en", "src2", 50),
        (1, "unique", "en", "src0", 6),
    ])

    from codebased_spark.dataops import dd_survivor_policy

    [r] = dd_survivor_policy(spark, str(tmp_path)).collect()
    assert (r.group_size, r.keep_first, r.keep_longest,
            r.policies_differ) == (3, 0, 15, 1)


def test_title_coherence_counts(spark, tmp_path):
    # title tokens: {src0, doc, 1}; body has "doc" and "src0" but not "1"
    _write_docs(spark, tmp_path, [
        (1, "the doc about src0 things", "en", "src0", 25),
        (2, "nothing relevant here", "en", "src9", 21),  # title {src9,doc,2}: 0 hits
    ])

    from codebased_spark.dataops import tx_title_coherence

    got = {r.doc_id: (r.n_title_toks, r.n_in_body, r.coherence_bp)
           for r in tx_title_coherence(spark, str(tmp_path)).collect()}
    assert got[1] == (3, 2, 6666)
    assert got[2] == (3, 0, 0)


def test_interevent_cadence_buckets(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # user 1 gaps: 1s (bucket 1), 5s (bucket 3), 0s (bucket 0)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base + dt.timedelta(seconds=1), 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=6), 1, "view", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=6), 1, "view", 1.0, "{}"),
        (9, base, 2, "view", 1.0, "{}"),  # single event: no gap row
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_interevent_cadence

    got = {r.bucket: r.n_gaps
           for r in q_interevent_cadence(spark, str(tmp_path)).collect()}
    assert got == {1: 1, 3: 1, 0: 1}


def test_url_depth_census(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        (9, "t", "en", "src0", 1),   # planted deep path -> depth 6
        (1, "t", "en", "src0", 1),   # /en/doc/1 -> depth 3
    ])

    from codebased_spark.dataops import kg_url_depth

    got = {(r.host, r.depth): r.n_urls
           for r in kg_url_depth(spark, str(tmp_path)).collect()}
    assert got == {("src0.example.org", 6): 1, ("src0.example.org", 3): 1}


def test_caps_ratio_flags_shouting(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        (8, "hello world ok", "en", "src0", 14),  # %8==0 -> fully uppercased
        (1, "Normal Text with ONE SHOUT", "en", "src0", 26),
    ])

    from codebased_spark.dataops import tx_caps_ratio

    got = {r.doc_id: (r.upper_bp, r.n_caps_tokens)
           for r in tx_caps_ratio(spark, str(tmp_path)).collect()}
    assert got[8] == (10000, 3)   # HELLO WORLD OK
    # doc 1: uppercase letters N,T,O,N,E,S,H,O,U,T = 10 of 22 letters
    assert got[1] == (10 * 10000 // 22, 2)  # ONE, SHOUT


def test_description_dupes_census(spark, tmp_path):
    # ids 0,6,12 share the host default; 1,2 get per-page descriptions
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in (0, 6, 12, 1, 2)])

    from codebased_spark.dataops import kg_description_dupes

    [r] = kg_description_dupes(spark, str(tmp_path)).collect()
    assert (r.n_pages, r.n_distinct_desc, r.max_dup_count) == (5, 3, 3)


def test_hour_of_week_slots(spark, tmp_path):
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),   # Mon 9am
        (1, dt.datetime(2024, 1, 1, 9, 30), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 7, 23), 1, "view", 1.0, "{}"),  # Sun 11pm
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_hour_of_week

    got = {r.how_slot: r.n_events
           for r in q_hour_of_week(spark, str(tmp_path)).collect()}
    # Spark dayofweek: Sun=1..Sat=7 -> Monday slot (2-1)*24+9 = 33
    assert got == {33: 2, 23: 1}


def test_shingle_df_profile_mass_conservation(spark, tmp_path):
    _write_docs(spark, tmp_path, [
        (1, "a b c d", "en", "src0", 7),   # shingles: abc, bcd
        (2, "a b c e", "en", "src0", 7),   # shingles: abc, bce
    ])

    from codebased_spark.dataops import dd_shingle_df_profile

    rows = dd_shingle_df_profile(spark, str(tmp_path)).collect()
    got = {r.bucket: (r.n_shingles, r.df_mass, r.df2_mass) for r in rows}
    # 'a b c' df=2 (bucket 2); 'b c d','b c e' df=1 (bucket 1)
    assert got == {2: (1, 2, 4), 1: (2, 2, 2)}


def test_frontier_growth_conservation(spark, tmp_path):
    # 300 captures -> 3 batches; 97 distinct urls all first seen in
    # batches 0 (100 new) ... but url space is 97 so batch 0 has 97 new
    # + 3 recrawls, batches 1-2 are pure recrawl
    _write_docs(spark, tmp_path,
                [(i, "t", "en", "src0", 1) for i in range(300)])

    from codebased_spark.dataops import kg_frontier_growth

    rows = sorted(kg_frontier_growth(spark, str(tmp_path)).collect(),
                  key=lambda r: r.batch)
    assert [r.n_new for r in rows] == [97, 0, 0]
    assert [r.n_recrawls for r in rows] == [3, 100, 100]
    assert rows[-1].distinct_urls_seen == 97
    assert all(r.n_fetches == r.n_new + r.n_recrawls for r in rows)
