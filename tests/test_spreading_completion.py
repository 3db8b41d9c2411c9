"""Seeded label spreading + group-mode attribute completion."""


def test_label_spreading_rounds_and_ties(spark, tmp_path):
    # build a documents table whose _doc_edges include predictable links;
    # simpler: exercise the registered query end-to-end on a small table
    rows = [(i, "t", "en", "src0", 20 + i % 7) for i in range(40)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import g_label_spreading

    out = g_label_spreading(spark, str(tmp_path)).collect()
    by_node = {r.node: r for r in out}
    # seeds keep their planted label at round 0
    for n in (0, 10, 20, 30):
        assert by_node[n].spread_round == 0
        assert by_node[n].label == (n // 10) % 3
    # labels only come from the planted label set
    assert all(r.label in (0, 1, 2) for r in out)
    # each node labeled at most once
    assert len(by_node) == len(out)
    # something actually spread beyond the seeds
    assert any(r.spread_round == 1 for r in out)


def test_label_spreading_deterministic(spark, tmp_path):
    rows = [(i, "t", "en", "src0", 20 + i % 7) for i in range(40)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import g_label_spreading

    a = sorted(map(tuple, g_label_spreading(spark, str(tmp_path)).collect()))
    b = sorted(map(tuple, g_label_spreading(spark, str(tmp_path)).collect()))
    assert a == b


def test_attr_completion_mode_and_tiebreak(spark, tmp_path):
    # src0: en x2, fr x1 -> mode en; masked doc 7 gets en.
    # src1: de x1, es x1 (tie) -> smallest string 'de'; masked doc 20 gets de.
    rows = [
        (1, "t", "en", "src0", 10),
        (2, "t", "en", "src0", 10),
        (3, "t", "fr", "src0", 10),
        (7, "t", "zh", "src0", 10),   # 7 % 13 == 7 -> masked
        (14, "t", "de", "src1", 10),
        (15, "t", "es", "src1", 10),
        (20, "t", "zh", "src1", 10),  # 20 % 13 == 7 -> masked
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_attr_completion

    got = {r.doc_id: r for r in kg_attr_completion(spark, str(tmp_path)).collect()}
    assert got[7].lang_filled == "en" and got[7].was_imputed == 1
    assert got[20].lang_filled == "de" and got[20].was_imputed == 1
    assert got[1].lang_filled == "en" and got[1].was_imputed == 0


def test_activity_streaks_islands(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 2, 1, 9)
    rows = []
    eid = 0
    # user 1: days 0,1,2 then 5,6 -> longest 3, 2 streaks
    for d in (0, 1, 2, 5, 6):
        rows.append((eid, t0 + datetime.timedelta(days=d), 1, "view", 1.0, "{}"))
        eid += 1
    # user 2: two events same day -> longest 1, 1 streak
    rows.append((eid, t0, 2, "view", 1.0, "{}")); eid += 1
    rows.append((eid, t0 + datetime.timedelta(hours=2), 2, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_activity_streaks

    got = {r.user_id: r for r in q_activity_streaks(spark, str(tmp_path)).collect()}
    assert got[1].longest_streak == 3 and got[1].n_streaks == 2
    assert got[2].longest_streak == 1 and got[2].n_streaks == 1


def test_vocab_growth_monotone_and_complete(spark, tmp_path):
    # 20 docs, each introducing one NEW bigram ("w<i> w<i>") plus a
    # shared one ("a b") -> vocab grows by 2 per bucket after bucket 1
    rows = [(i, f"a b w{i} w{i}", "en", "src0", 10) for i in range(20)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import tx_vocab_growth

    out = sorted(tx_vocab_growth(spark, str(tmp_path)).collect(),
                 key=lambda r: r.pct_docs)
    assert [r.pct_docs for r in out] == [i * 10 for i in range(1, 11)]
    # monotone cumulative; final = total distinct bigrams
    sizes = [r.vocab_size for r in out]
    assert sizes == sorted(sizes)
    # per doc bigrams: a_b, b_w<i>, w<i>_w<i> -> doc0 contributes 3, each
    # later doc 2 new; total = 3 + 19*2
    assert sizes[-1] == 3 + 19 * 2


def test_k_anonymity_flags_small_groups(spark, tmp_path):
    rows = [(i, "t", "en", "src0", 150) for i in range(6)]       # size 6: safe
    rows += [(10 + i, "t", "fr", "src0", 150) for i in range(2)]  # size 2: risky
    rows += [(20, "t", "en", "src1", 950)]                        # size 1: risky
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import tx_k_anonymity

    got = {
        (r.lang, r.source, r.len_bucket): (r.group_size, r.is_risky)
        for r in tx_k_anonymity(spark, str(tmp_path)).collect()
    }
    assert got[("en", "src0", 1)] == (6, 0)
    assert got[("fr", "src0", 1)] == (2, 1)
    assert got[("en", "src1", 9)] == (1, 1)


def test_event_transitions_counts_and_shares(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 3, 1)
    # user 1 stream: v -> c -> v -> c ; user 2: v -> p
    seq = [(1, "view"), (1, "click"), (1, "view"), (1, "click"), (2, "view"), (2, "purchase")]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), uid, typ, 1.0, "{}")
        for i, (uid, typ) in enumerate(seq)
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    from codebased_spark.dataops import q_event_transitions

    got = {
        (r.prev_type, r.next_type): (r.n, r.share_bp)
        for r in q_event_transitions(spark, str(tmp_path)).collect()
    }
    # from 'view': 2x ->click, 1x ->purchase (user boundary NOT a transition)
    assert got[("view", "click")] == (2, 6666)
    assert got[("view", "purchase")] == (1, 3333)
    assert got[("click", "view")] == (1, 10000)
    assert ("purchase", "view") not in got  # streams don't cross users
