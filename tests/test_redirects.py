"""Meta-refresh extraction + chain resolution (extract/redirects.py)."""

from __future__ import annotations

from codebased_spark.extract.redirects import (
    redirect_edges,
    resolve_redirect_chains,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], ["url", "html"]
    )


def _edges(spark, rows):
    return {
        (r.src_url, r.target)
        for r in redirect_edges(_pages(spark, rows)).collect()
    }


def test_markup_tolerance(spark):
    got = _edges(
        spark,
        [
            # canonical lowercase, absolute
            ("https://a/x", '<meta http-equiv="refresh" content="0; url=https://a/y">'),
            # uppercase, single quotes, content BEFORE http-equiv, relative
            ("https://a/p/q", "<META CONTENT='5;URL=r' HTTP-EQUIV='Refresh'>"),
            # url-less refresh: no edge
            ("https://a/z", '<meta http-equiv="refresh" content="30">'),
            # unrelated meta: no edge
            ("https://a/w", '<meta name="viewport" content="url=fake">'),
        ],
    )
    assert got == {
        ("https://a/x", "https://a/y"),
        ("https://a/p/q", "https://a/p/r"),
    }


def test_self_redirect_dropped(spark):
    got = _edges(
        spark,
        [("https://a/x", '<meta http-equiv="refresh" content="0; url=https://a/x">')],
    )
    assert got == set()


def test_chain_resolves_to_terminal(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src_url", "target"]
    )
    got = {
        r.src_url: (r.final_url, r.is_resolved)
        for r in resolve_redirect_chains(edges).collect()
    }
    assert got == {"a": ("d", 1), "b": ("d", 1), "c": ("d", 1)}


def test_cycle_flagged_unresolved(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], ["src_url", "target"]
    )
    got = {
        r.src_url: (r.final_url, r.is_resolved)
        for r in resolve_redirect_chains(edges).collect()
    }
    # 16 hops from a lands on a; from b on b; from c (1 + 15 hops) on b
    assert got["a"] == ("a", 0)
    assert got["b"] == ("b", 0)
    assert got["c"][1] == 0
