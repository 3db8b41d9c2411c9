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
