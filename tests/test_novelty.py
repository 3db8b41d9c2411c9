"""First-seen n-gram novelty (textops/novelty.py)."""

from __future__ import annotations

from codebased_spark.textops.novelty import novelty_profile


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in novelty_profile(df, **kw).collect()
    }


def test_first_doc_is_fully_novel_reemission_is_not(spark):
    got = _run(
        spark,
        [
            (0, "a b c d"),          # bigrams: ab bc cd — all first here
            (1, "a b c d"),          # exact re-emission: novelty 0
            (2, "a b x y"),          # ab seen, bx and xy new: 2/3
        ],
    )
    assert got[0] == (3, 3, 1.0)
    assert got[1] == (3, 0, 0.0)
    assert got[2] == (3, 2, 2 / 3)


def test_distinct_grams_counted_once(spark):
    # 'a b a b a' -> distinct bigrams {a b, b a}: n_grams 2, both novel
    got = _run(spark, [(0, "a b a b a")])
    assert got[0] == (2, 2, 1.0)


def test_single_token_docs_dropped(spark):
    got = _run(spark, [(0, "solo"), (1, "two words")])
    assert set(got) == {1}
