"""Cross-document duplicated-span statistics (dedup/spans.py)."""

from __future__ import annotations

from codebased_spark.dedup.spans import dup_span_stats

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-token span


def test_planted_shared_span_detected(spark):
    docs = spark.createDataFrame(
        [
            (0, SHARED + " unique0 tail0 words0 here0"),
            (1, "lead1 words1 " + SHARED + " tail1"),
            (2, "totally different text with no overlap at all in here ok"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_span_stats(docs, n=8).collect()}
    # the shared 8-token window appears in docs 0 and 1
    assert rows[0].n_cross_dup >= 1 and rows[1].n_cross_dup >= 1
    assert rows[2].n_cross_dup == 0 and rows[2].dup_frac == 0.0
    # every doc row is present, with sane spans counts
    assert rows[0].n_spans == 5  # 12 tokens -> 5 windows, all distinct
    assert 0.0 < rows[0].dup_frac <= 1.0


def test_short_docs_emit_zero_spans(spark):
    docs = spark.createDataFrame(
        [(0, "only three tokens"), (1, "a b c d e f g h")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in dup_span_stats(docs, n=8).collect()}
    assert rows[0].n_spans == 0 and rows[0].dup_frac == 0.0
    assert rows[1].n_spans == 1 and rows[1].n_cross_dup == 0


def test_within_doc_repeat_is_not_cross_dup(spark):
    """A span repeated twice inside ONE doc is distinct-deduped and must
    not count as cross-document duplication."""
    docs = spark.createDataFrame(
        [(0, SHARED + " " + SHARED), (1, "eight completely different words sit in this doc")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_span_stats(docs, n=8).collect()}
    assert rows[0].n_cross_dup == 0
