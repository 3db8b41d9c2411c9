"""URL-based bitext document alignment (textops/bitext.py)."""

from __future__ import annotations

from codebased_spark.textops.bitext import bitext_candidates


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "lang", "text"])


def test_pairs_by_lang_stripped_url(spark):
    rows = [
        ("https://a.org/en/doc/1", "en", "x" * 100),
        ("https://a.org/de/doc/1", "de", "y" * 120),
        ("https://a.org/en/doc/2", "en", "x" * 50),  # no de twin
        ("https://b.org/de/doc/1", "de", "y" * 100),  # other host, no en twin
    ]
    got = [tuple(r) for r in bitext_candidates(_pages(spark, rows)).collect()]
    assert got == [
        (
            "https://a.org/doc/1",
            "https://a.org/en/doc/1",
            "https://a.org/de/doc/1",
            100,
            120,
            1.2,
        )
    ]


def test_ratio_filter_drops_non_parallel(spark):
    rows = [
        ("https://a.org/en/doc/1", "en", "x" * 100),
        ("https://a.org/de/doc/1", "de", "y" * 3),  # 0.03 — dropped
        ("https://a.org/en/doc/2", "en", "x" * 100),
        ("https://a.org/de/doc/2", "de", "y" * 200),  # 2.0 — boundary kept
        ("https://a.org/en/doc/3", "en", "x" * 100),
        ("https://a.org/de/doc/3", "de", "y" * 201),  # 2.01 — dropped
    ]
    keys = {
        r.pair_key for r in bitext_candidates(_pages(spark, rows)).collect()
    }
    assert keys == {"https://a.org/doc/2"}


def test_join_shuffles_on_the_narrow_pair_key(spark):
    rows = [
        ("https://a.org/en/doc/1", "en", "x" * 100),
        ("https://a.org/de/doc/1", "de", "y" * 120),
    ]
    df = bitext_candidates(_pages(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # any exchange must partition on pair_key, and the text column is
    # reduced to a length map-side — it never appears as a join output
    if "hashpartitioning" in plan:
        assert "hashpartitioning(pair_key" in plan
    assert "text" not in df.columns
    assert "BatchEvalPython" not in plan
