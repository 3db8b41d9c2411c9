"""SQL table-function surface (codebased_spark/udtfs.py): UDTF results
must agree with their corpus-scale DataFrame twins."""

from __future__ import annotations


def test_qa_udtf_matches_dataframe_twin(spark):
    from codebased_spark.textops.qa import qa_pairs
    from codebased_spark.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [
            (1, "Q: One? A: First. Q: Two? A: Second."),
            (2, "no pairs"),
            (3, "Q: Solo? A: Yes."),
        ],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_sql = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in spark.sql(
            "SELECT d.doc_id, q.* FROM udtf_docs d, LATERAL qa_pairs(d.text) q"
        ).collect()
    )
    via_df = sorted(
        (r.doc_id, r.pair_idx, r.question, r.answer)
        for r in qa_pairs(docs).collect()
    )
    assert via_sql == via_df and len(via_sql) == 3


def test_srt_udtf_matches_dataframe_twin(spark):
    from codebased_spark.media.captions import parse_srt
    from codebased_spark.udtfs import register_udtfs

    register_udtfs(spark)
    srt = ("1\n00:00:01,000 --> 00:00:02,500\nhello\n\n"
           "junk block\n\n"
           "2\n01:02:03,250 --> 01:02:04,000\nbye")
    docs = spark.createDataFrame([(7, srt)], ["doc_id", "srt"])
    docs.createOrReplaceTempView("udtf_subs")
    via_sql = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in spark.sql(
            "SELECT c.* FROM udtf_subs s, LATERAL srt_cues(s.srt) c"
        ).collect()
    )
    via_df = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in parse_srt(docs).collect()
    )
    assert via_sql == via_df and len(via_sql) == 2


def test_srt_multiline_and_crlf(spark):
    """Real-world SRT: CRLF line endings and captions wrapped across
    several lines — both parsers must agree and keep every caption line
    (ADVICE r4: element_at(...,3) used to drop lines 4..N silently)."""
    from codebased_spark.media.captions import parse_srt
    from codebased_spark.udtfs import register_udtfs

    register_udtfs(spark)
    srt = ("1\r\n00:00:01,000 --> 00:00:02,500\r\nfirst line\r\nsecond line\r\n"
           "\r\n"
           "2\r\n00:00:03,000 --> 00:00:04,000\r\nsingle\r\n")
    docs = spark.createDataFrame([(9, srt)], ["doc_id", "srt"])
    docs.createOrReplaceTempView("udtf_subs_crlf")
    via_df = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in parse_srt(docs).collect()
    )
    via_sql = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in spark.sql(
            "SELECT c.* FROM udtf_subs_crlf s, LATERAL srt_cues(s.srt) c"
        ).collect()
    )
    assert via_df == [
        (1, 1000, 2500, "first line\nsecond line"),
        (2, 3000, 4000, "single"),
    ]
    assert via_sql == via_df
