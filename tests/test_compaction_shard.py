"""Compaction bin-packing plan + rendezvous shard assignment."""


def test_compaction_groups_contiguous_and_complete(spark, tmp_path):
    # 4 sources with 3 docs of 3000 chars each -> f_bytes 9000; target
    # 20000 -> starts at 0, 9000, 18000, 27000 -> groups 0,0,0,1
    rows = []
    did = 0
    for s in range(4):
        for _ in range(3):
            rows.append((did, "t", "en", f"src{s}", 3000))
            did += 1
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_compaction_plan

    got = {r.group_id: r for r in kg_compaction_plan(spark, str(tmp_path)).collect()}
    assert got[0].n_files == 3 and got[0].group_bytes == 27000
    assert got[1].n_files == 1 and got[1].group_bytes == 9000
    assert got[0].first_source == "src0" and got[0].last_source == "src2"
    assert sum(r.group_bytes for r in got.values()) == 36000


def test_shard_assignment_rendezvous_stability(spark, tmp_path):
    rows = [(i, "t", "en", f"src{i % 20}", 10) for i in range(40)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_shard_assignment

    out = kg_shard_assignment(spark, str(tmp_path)).collect()
    assert len(out) == 20
    # hand-check one host against the definition
    def hrw(h, s):
        return ((h * 2654435761 + s * 40503) % 104729) * 64 + s

    r7 = next(r for r in out if r.src_num == 7)
    assert r7.shard32 == max(range(32), key=lambda s: hrw(7, s))
    assert r7.shard33 == max(range(33), key=lambda s: hrw(7, s))
    # rendezvous property: a host moves ONLY if its new argmax is the
    # added shard 32
    for r in out:
        if r.moved:
            assert r.shard33 == 32
    # churn is bounded well below a full reshuffle
    assert sum(r.moved for r in out) <= 6
