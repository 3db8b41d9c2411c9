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
