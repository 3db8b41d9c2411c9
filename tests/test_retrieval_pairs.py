"""Anchor-to-target retrieval pair mining (textops/retrieval_pairs.py)."""

from __future__ import annotations

from codebased_spark.textops.retrieval_pairs import query_doc_pairs


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode(), t) for u, h, t in rows], ["url", "html", "text"]
    )


def test_pair_mining_end_to_end(spark):
    pages = _pages(
        spark,
        [
            ("https://a/1", '<a href="https://a/2">solar system guide</a>', "page one"),
            # second linker with the SAME anchor text -> n_srcs = 2
            ("https://a/3", "<A CLASS='x' HREF='https://a/2'>solar system guide</A>", "page three"),
            # single-token boilerplate anchor: dropped
            ("https://a/4", '<a href="https://a/2">here</a>', "page four"),
            # dangling link (no such page): dropped by the join
            ("https://a/5", '<a href="https://a/404">missing page now</a>', "page five"),
            # self-link: dropped
            ("https://a/2", '<a href="https://a/2">self referential link</a>', "the target passage text"),
        ],
    )
    got = {
        (r.query, r.target_url): (r.n_srcs, r.passage)
        for r in query_doc_pairs(pages).collect()
    }
    assert got == {
        ("solar system guide", "https://a/2"): (2, "the target passage text")
    }


def test_passage_truncated(spark):
    pages = _pages(
        spark,
        [
            ("https://a/1", '<a href="https://a/2">long doc link</a>', "x"),
            ("https://a/2", "", "y" * 500),
        ],
    )
    [r] = query_doc_pairs(pages, passage_chars=10).collect()
    assert r.passage == "y" * 10
