"""Merkle-bucket snapshot diff localizes planted changes."""


def test_merkle_diff_flags_only_mutated_buckets(spark, tmp_path):
    n = 200
    rows = [(i, f"text {i}", "en", "src0", 10) for i in range(n)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_merkle_diff

    out = kg_merkle_diff(spark, str(tmp_path)).collect()
    assert len(out) == 64
    # mutated docs: doc_id % 97 == 5 -> ids 5, 102, 199 -> buckets 5, 38, 7
    expect_changed = {5 % 64, 102 % 64, 199 % 64}
    got_changed = {r.bucket for r in out if r.changed}
    assert got_changed == expect_changed
    # unchanged buckets carry identical digests
    for r in out:
        assert (r.digest_a == r.digest_b) == (r.changed == 0)
    assert sum(r.n_docs for r in out) == n
