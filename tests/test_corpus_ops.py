"""Corpus-derived statistics and graph-ML prep operators new in r4:
boilerplate n-gram detection (textops/boilerplate.py), learned stopwords
(textops/corpus_stats.py), deterministic walks (graph/walks.py), and
synchronous label propagation (graph/lpa.py)."""

from __future__ import annotations

from codebased_spark.dedup.exact import mirror_groups
from codebased_spark.graph.lpa import label_propagation
from codebased_spark.graph.walks import deterministic_walks
from codebased_spark.textops.boilerplate import boilerplate_metrics
from codebased_spark.textops.corpus_stats import (
    build_postings,
    learned_stopword_fraction,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_boilerplate_flags_host_template(spark):
    banner = "cookie consent required accept all"
    rows = [
        (i, "h1", f"unique{i} words{i} only{i} here{i} more{i} {banner}")
        for i in range(6)
    ]
    # a different host sharing the banner must not pool df across hosts
    rows += [(10, "h2", f"other{j} text{j} {banner}") for j in (0,)]
    out = {
        r.doc_id: r
        for r in boilerplate_metrics(
            _docs(spark, rows), n=4, min_df=5
        ).collect()
    }
    # h1 docs: banner contributes 2 internal 4-grams with df=6 >= 5;
    # the doc-tail/banner boundary grams are unique per doc (df=1)
    for i in range(6):
        assert out[i].n_boiler == 2, out[i]
        assert out[i].n_grams == 7  # 10 words -> 7 overlapping 4-grams
    # same grams on h2 have df=1 there -> not boilerplate
    assert out[10].n_boiler == 0


def test_boilerplate_templated_flag_threshold(spark):
    # doc that is nothing but the shared banner -> frac 1.0 -> flagged
    rows = [(i, "h", "cookie consent required accept all") for i in range(5)]
    rows.append((99, "h", " ".join(f"w{k}" for k in range(20))
                 + " cookie consent required accept all"))
    out = {r.doc_id: r for r in boilerplate_metrics(
        _docs(spark, rows), n=4, min_df=5).collect()}
    assert out[0].boiler_frac == 1.0 and out[0].is_templated == 1
    assert out[99].is_templated == 0  # 2 of 22 grams -> below 0.2


def test_learned_stopwords_top_k_and_fraction(spark):
    docs = spark.createDataFrame(
        [
            (0, "the the the cat"),
            (1, "the dog runs"),
            (2, "a a mouse"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in learned_stopword_fraction(docs, k=2).collect()
    }
    # corpus counts: the=4, a=2, cat/dog/runs/mouse=1 -> top2 = {a, the}
    # (tie at c=1 never reaches the cut; 'a' beats nothing — k=2 exactly)
    assert out[0].n_stop == 3 and out[0].n_words == 4
    assert out[1].n_stop == 1
    assert out[2].n_stop == 2
    assert abs(out[0].stop_frac - 0.75) < 1e-9


def test_walks_follow_hash_choice_and_terminate(spark):
    # 0 -> {1, 2}; 1 -> {3}; 2, 3 absorbing (no out-edges)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], ["src", "dst"]
    )
    rows = deterministic_walks(edges, length=3).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r.origin, {})[r.step] = r.node
    assert set(walks) == {0, 1}  # only nodes with out-edges start walks
    assert walks[0][0] == 0 and walks[1][0] == 1
    # step from 0: idx = (0*40503 + 1*7919 + 0*104729) % 2 = 1 -> nbr[1]=2
    assert walks[0][1] == 2
    assert 2 not in walks[0] or walks[0].get(2) is None  # absorbed at 2
    # walk from 1: deg=1 so idx always 0 -> 3, then absorbed
    assert walks[1][1] == 3 and 2 not in walks[1]


def test_walks_are_deterministic(spark):
    edges = spark.createDataFrame(
        [(i, (i + j) % 7) for i in range(7) for j in (1, 3)], ["src", "dst"]
    )
    a = sorted(map(tuple, deterministic_walks(edges, length=4).collect()))
    b = sorted(map(tuple, deterministic_walks(edges, length=4).collect()))
    assert a == b and len(a) == 7 * 5


def test_mirror_groups_cross_host_only(spark):
    docs = _docs(
        spark,
        [
            (0, "a.com", "shared page body"),
            (1, "b.com", "shared page body"),   # mirror of 0 on another host
            (2, "a.com", "shared page body"),   # same-host dup: no new host
            (3, "a.com", "unique body"),
            (4, "c.com", "other shared"),
            (5, "c.com", "other shared"),       # same-host only -> excluded
        ],
    )
    rows = mirror_groups(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_hosts == 2 and r.n_docs == 3 and r.first_doc == 0
    assert r.first_host == "a.com" and r.last_host == "b.com"


def test_postings_champion_list_is_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "apple banana" if i % 2 == 0 else "apple") for i in range(10)],
        ["doc_id", "text"],
    )
    out = {r.term: r for r in build_postings(docs, champions=3).collect()}
    assert out["apple"].df == 10 and out["apple"].tf_total == 10
    assert out["apple"].champions == "0,1,2"  # capped at 3 of 10
    assert out["banana"].df == 5 and out["banana"].champions == "0,2,4"


def test_lpa_two_cliques_converge_to_min_label(spark):
    # two triangles bridged by nothing: each converges to its min node id
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    edges = spark.createDataFrame(tri1 + tri2, ["src", "dst"])
    out = {r.node: r.community for r in label_propagation(edges, rounds=3).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[10] == out[11] == out[12] == 10


def test_lpa_drops_self_loops_and_isolated(spark):
    edges = spark.createDataFrame(
        [(0, 0), (1, 2)], ["src", "dst"]
    )
    out = {r.node: r.community for r in label_propagation(edges, rounds=2).collect()}
    assert 0 not in out  # self-loop only -> no neighbors -> skipped
    # a lone symmetric pair oscillates under synchronous LPA (the known
    # bipartite limit cycle): after an even round count each node is back
    # to its own label — what matters here is determinism, not consensus
    assert out[1] == 1 and out[2] == 2
