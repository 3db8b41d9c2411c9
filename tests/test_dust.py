"""DUST parameter-rule learning (sources/dust.py)."""

from __future__ import annotations


def _rules(spark, rows):
    from codebased_spark.sources.dust import dust_param_rules

    pages = spark.createDataFrame(rows, ["url", "text"])
    return {
        (r.host, r.param): (r.n_pairs, r.n_equal, r.verdict)
        for r in dust_param_rules(pages).collect()
    }


def test_strip_keep_and_no_evidence(spark):
    got = _rules(
        spark,
        [("https://a.com/p?id=1", "one"),
         ("https://a.com/p?id=1&utm=x", "one"),        # same content -> strip
         ("https://a.com/p?id=2", "two"),
         ("https://a.com/p?id=2&page=2", "two page2"),  # differs -> keep
         ("https://a.com/p?id=3&sess=9", "three")],     # no twin -> no rule
    )
    assert got[("a.com", "utm")] == (1, 1, "strip")
    assert got[("a.com", "page")] == (1, 0, "keep")
    assert ("a.com", "sess") not in got and ("a.com", "id") not in got


def test_param_order_is_canonicalized(spark):
    # probe key must match regardless of query-string ordering
    got = _rules(
        spark,
        [("https://b.com/p?x=1&id=7", "same"),
         ("https://b.com/p?id=7&utm=t&x=1", "same")],
    )
    assert got[("b.com", "utm")] == (1, 1, "strip")


def test_one_bad_pair_flips_to_keep_and_hosts_are_separate(spark):
    got = _rules(
        spark,
        [("https://c.com/p?id=1", "a"), ("https://c.com/p?id=1&ref=r", "a"),
         ("https://c.com/p?id=2", "b"), ("https://c.com/p?id=2&ref=r", "CHANGED"),
         ("https://d.com/p?id=1", "a"), ("https://d.com/p?id=1&ref=r", "a")],
    )
    assert got[("c.com", "ref")] == (2, 1, "keep")
    assert got[("d.com", "ref")] == (1, 1, "strip")


def test_ambiguous_base_content_is_dropped(spark):
    # the param-less base url appears twice with different content ->
    # its evidence is ambiguous and must be excluded entirely
    got = _rules(
        spark,
        [("https://e.com/p?id=1", "v1"),
         ("https://e.com/p?id=1", "v2"),
         ("https://e.com/p?id=1&utm=x", "v1")],
    )
    assert ("e.com", "utm") not in got
