"""Asymmetric containment join (dedup/containment.py)."""

from __future__ import annotations

from codebased_spark.dedup.containment import containment_pairs


def _pairs(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        (r.doc_inner, r.doc_outer): r.containment
        for r in containment_pairs(df, **kw).collect()
    }


def test_quote_inside_page_is_one_directional(spark):
    page = "the quick brown fox jumps over the lazy dog " * 8
    quote = "the quick brown fox jumps"
    got = _pairs(spark, [(1, page.strip()), (2, quote)], threshold=0.9)
    # every quote shingle appears in the page -> containment 1.0
    assert got[(2, 1)] == 1.0


def test_direction_asymmetric(spark):
    page = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    quote = "alpha beta gamma delta epsilon"
    got = _pairs(spark, [(1, page), (2, quote)], threshold=0.5)
    assert got[(2, 1)] == 1.0
    assert (1, 2) not in got  # 18 page shingles, only 3 shared


def test_disjoint_docs_emit_nothing(spark):
    got = _pairs(
        spark,
        [(1, "one two three four five"), (2, "six seven eight nine ten")],
        threshold=0.1,
    )
    assert got == {}


def test_threshold_excludes_partial_overlap(spark):
    a = "w1 w2 w3 w4 w5 w6"  # shingles: 4
    b = "w1 w2 w3 w4 zzz yyy"  # shares w1w2w3, w2w3w4 -> containment 0.5
    got = _pairs(spark, [(1, a), (2, b)], threshold=0.6)
    assert got == {}
    got = _pairs(spark, [(1, a), (2, b)], threshold=0.5)
    assert got[(1, 2)] == 0.5 and got[(2, 1)] == 0.5


def test_prefix_filter_equals_counting_twin(spark):
    from codebased_spark.dedup.containment import containment_pairs_counting

    docs = [
        (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
        (2, "w1 w2 w3 w4 w5"),          # prefix of 1
        (3, "w4 w5 w6 w7 w8 zz yy"),     # partial overlap
        (4, "a1 a2 a3 a4"),              # disjoint
        (5, "w1 w2 w3 w4 w5 w6 w7 w8"),  # exact dup of 1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for t in (0.5, 0.8, 1.0):
        a = sorted(map(tuple, containment_pairs(df, threshold=t).collect()))
        b = sorted(map(tuple, containment_pairs_counting(df, threshold=t).collect()))
        assert a == b, f"threshold {t}"
        assert a, f"threshold {t} vacuous"
