"""Known-bigram fraction LM proxy (textops/lmscore.py)."""

from __future__ import annotations

from codebased_spark.textops.lmscore import known_bigram_fraction


def test_fraction_counts_instances_not_types(spark):
    # 'a b' occurs 3x corpus-wide (df=3 >= 2); 'b c' occurs once
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),   # bigrams: 'a b', 'b a', 'a b'
            (2, "a b c"),     # bigrams: 'a b', 'b c'
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: (r.n_bigrams, r.n_known, r.known_fraction)
        for r in known_bigram_fraction(docs, min_df=2).collect()
    }
    # doc1: 'a b' (df 3) x2 known, 'b a' (df 1) not -> 2/3
    assert rows[1] == (3, 2, 0.6667)
    # doc2: 'a b' known, 'b c' not -> 1/2
    assert rows[2] == (2, 1, 0.5)


def test_short_docs_emit_no_row(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")], ["doc_id", "text"]
    )
    out = known_bigram_fraction(docs, min_df=1)
    assert [r.doc_id for r in out.collect()] == [3]


def test_count_shuffle_is_hash_keyed(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        known_bigram_fraction(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan
