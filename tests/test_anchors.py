"""Anchor-text extraction + aggregation + domain graph (extract/anchors.py)."""

from __future__ import annotations

from codebased_spark.extract.anchors import (
    anchor_text_summary,
    domain_graph,
    exploded_anchors,
    with_anchors,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], ["url", "html"]
    )


def test_anchor_extraction_shapes(spark):
    pages = _pages(
        spark,
        [
            (
                "https://a.example.com/p1",
                '<p>x</p><a href="https://t.example.com/x">  Click\n here </a>'
                '<a href="https://t.example.com/y" rel="nofollow" class="z">Other</a>'
                '<a href="https://t.example.com/img"><img src="i.png"/></a>'
                '<a href="https://t.example.com/e"></a>',
            )
        ],
    )
    got = {
        (r.target, r.anchor_text)
        for r in exploded_anchors(pages).collect()
    }
    # whitespace collapsed+trimmed; attribute tail tolerated; nested-markup
    # and empty-text anchors dropped
    assert got == {
        ("https://t.example.com/x", "Click here"),
        ("https://t.example.com/y", "Other"),
    }
    arr = with_anchors(pages).select("anchors").first()[0]
    assert [a.href for a in arr] == [
        "https://t.example.com/x",
        "https://t.example.com/y",
        "https://t.example.com/e",
    ]


def test_anchor_text_summary_ranks_and_cuts(spark):
    rows = [
        (f"https://s{i}.example.com/p", '<a href="https://t.example.com/">Home</a>')
        for i in range(3)
    ] + [
        ("https://s9.example.com/p", '<a href="https://t.example.com/">Start</a>'),
        ("https://s9.example.com/q", '<a href="https://t.example.com/">Alpha</a>'),
    ]
    out = anchor_text_summary(_pages(spark, rows), k=2).collect()
    by_rank = {r.rnk: r for r in out}
    assert len(out) == 2
    assert by_rank[1].anchor_text == "Home" and by_rank[1].n_refs == 3
    assert by_rank[1].n_src_pages == 3
    # tie between Start/Alpha (1 ref each) broken alphabetically; k=2 cut
    assert by_rank[2].anchor_text == "Alpha"


def test_domain_graph_counts_and_drops_malformed(spark):
    rows = [
        (
            "https://a.example.com/p1",
            '<a href="https://b.example.com/x">b</a>'
            '<a href="https://b.example.com/y">b2</a>'
            '<a href="https://a.example.com/self">self</a>'
            '<a href="not a url">junk</a>',
        ),
        ("https://a.example.com/p2", '<a href="https://b.example.com/z"> </a>'),
    ]
    got = {
        (r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
        for r in domain_graph(_pages(spark, rows)).collect()
    }
    # empty-text anchors count as links; malformed hrefs are dropped;
    # self-loops kept
    assert got == {
        ("a.example.com", "b.example.com"): (3, 2),
        ("a.example.com", "a.example.com"): (1, 1),
    }


def test_anchor_plans_stay_jvm_with_partial_agg(spark):
    """Plan contract: anchor extraction is pure JVM (no Python fallback)
    and both aggregations keep a map-side partial before the shuffle —
    the property that bounds shuffle rows by distinct (target, text) /
    host pairs instead of raw in-degree at web scale."""
    pages = _pages(spark, [("https://a.example.com/p", '<a href="https://b.example.com/">b</a>')])
    for df in (anchor_text_summary(pages), domain_graph(pages)):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # partial_count before the exchange = map-side combine
        assert "partial_count" in p


def test_cocitation_counts_and_out_degree_cap(spark):
    from codebased_spark.extract.anchors import cocitation

    def links(*hrefs):
        return "".join(f'<a href="{h}">x</a>' for h in hrefs)

    rows = [
        ("https://s1.example.com/", links("https://a/", "https://b/")),
        ("https://s2.example.com/", links("https://a/", "https://b/", "https://c/")),
        # link farm above the cap: must contribute no pairs
        ("https://farm.example.com/", links(*[f"https://f{i}/" for i in range(5)])),
    ]
    pages = _pages(spark, rows)
    got = {
        (r.target_a, r.target_b): r.n_cociting
        for r in cocitation(pages, max_out=4).collect()
    }
    assert got == {
        ("https://a/", "https://b/"): 2,
        ("https://a/", "https://c/"): 1,
        ("https://b/", "https://c/"): 1,
    }


def test_link_reciprocity(spark):
    from codebased_spark.extract.anchors import link_reciprocity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # mutual pair
            ("a", "c"),                       # one-way
            ("a", "a"),                       # self-loop: excluded
            ("a", "b"),                       # duplicate edge: deduped
            ("d", "a"),                       # one-way into a
        ],
        ["src_host", "dst_host"],
    )
    rows = {
        r.host: (r.n_out, r.n_reciprocal, r.reciprocity)
        for r in link_reciprocity(edges).collect()
    }
    assert rows["a"] == (2, 1, 0.5)   # out: b (recip), c (not)
    assert rows["b"] == (1, 1, 1.0)
    assert rows["d"] == (1, 0, 0.0)
    assert "c" not in rows            # no out-links -> no row


def test_anchor_dictionary_prior(spark):
    from codebased_spark.extract.anchors import anchor_dictionary

    def page(url, *anchors):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in anchors)
        return (url, f"<html><body>{body}</body></html>".encode())

    pages = spark.createDataFrame(
        [
            page("https://a.org/1", ("https://t.org/x", "acme"),
                 ("https://t.org/x", "acme")),
            page("https://a.org/2", ("https://t.org/y", "acme")),
            page("https://a.org/3", ("https://t.org/z", "other")),
        ],
        ["url", "html"],
    )
    rows = {
        (r.anchor_text, r.target): (r.n_refs, r.n_surface_total, r.prior, r.rnk)
        for r in anchor_dictionary(pages).collect()
    }
    # 'acme' -> x twice, y once: argmax prior 2/3 on x
    assert rows[("acme", "https://t.org/x")] == (2, 3, 0.6667, 1)
    assert rows[("acme", "https://t.org/y")] == (1, 3, 0.3333, 2)
    assert rows[("other", "https://t.org/z")] == (1, 1, 1.0, 1)
