"""End-to-end pipeline: P/R ≥ 0.95 vs golden triples + schema contracts.

The P/R gate is the authoritative correctness metric from BASELINE.json;
the schema assertions mirror the reference's storage tests
(test_database.py:124-138).
"""

import pytest

from codebased_spark.graph.pipeline import extract_triples


@pytest.fixture(scope="module")
def result(spark, corpus):
    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    return extract_triples(spark, pages, gaz), corpus


def test_triple_precision_recall(result):
    res, corpus = result
    pred = set(tuple(r) for r in res.triples.collect())
    gold = set(map(tuple, corpus.golden_triples.itertuples(index=False)))
    tp = len(pred & gold)
    precision = tp / max(len(pred), 1)
    recall = tp / max(len(gold), 1)
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_nodes_schema_and_unique_ids(result):
    res, _ = result
    nodes = res.nodes
    assert set(nodes.columns) == {"id", "uid", "name", "type", "source_url", "meta"}
    total = nodes.count()
    assert nodes.select("id").distinct().count() == total
    assert nodes.where("uid is null or length(uid) != 64").count() == 0
    # Page nodes carry the markup metadata map (E15/E4): title + og tags
    # from the fixture template; entity nodes have no markup metadata
    from pyspark.sql import functions as F

    pages_meta = nodes.where("type = 'Page'").select(
        F.element_at("meta", "og:locale").alias("loc"),
        F.element_at("meta", "title").alias("title"),
    )
    assert pages_meta.where(F.col("loc").isNull()).count() == 0
    assert pages_meta.where(~F.col("title").rlike("^t[0-9]+$")).count() == 0
    # entity nodes carry alias-count + link-confidence metadata (E6)
    ents = nodes.where(
        ~F.col("type").isin("Page", "ExternalPage", "External")
    )
    assert ents.where(F.element_at("meta", "n_aliases").isNull()).count() == 0
    assert (
        ents.where(F.element_at("meta", "n_aliases").cast("int") < 1).count()
        == 0
    )


def test_no_dangling_edges(result):
    """Every edge endpoint resolves to a node (J7 external-stub contract)."""
    res, _ = result
    node_ids = res.nodes.select("id")
    dangling_src = res.edges.join(node_ids, res.edges.src == node_ids.id, "left_anti")
    # MENTIONS/relation dst are entity nodes; LINKS_TO dst are page or stub
    dangling_dst = res.edges.join(node_ids, res.edges.dst == node_ids.id, "left_anti")
    assert dangling_src.count() == 0
    assert dangling_dst.count() == 0


def test_deterministic_rerun(result, spark):
    """Re-running extraction yields identical triples (content-hash idempotence,
    reference E11/A8 — the property that makes task retries safe)."""
    res, corpus = result
    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    again = extract_triples(spark, pages, gaz)
    a = set(tuple(r) for r in res.triples.collect())
    b = set(tuple(r) for r in again.triples.collect())
    assert a == b


def test_size_guard_drops_oversized_docs(spark, corpus):
    """S1 analog (base.py:146-149): docs over max_html_bytes never reach
    extraction; everything else is unaffected."""
    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    big_url = corpus.pages.iloc[0].url
    import pyspark.sql.functions as F

    padded = pages.withColumn(
        "html",
        F.when(
            F.col("url") == big_url,
            F.concat(F.col("html"), F.encode(F.lit("x" * 5000), "UTF-8")),
        ).otherwise(F.col("html")),
    )
    res = extract_triples(spark, padded, gaz, max_html_bytes=4000)
    urls = {r.url for r in res.triples.select("url").distinct().collect()}
    assert big_url not in urls
    assert len(urls) > 0


def test_non_english_pages_skip_mention_scan(result):
    """Routing (S4/S5 analog): de/fr pages produce LINKS_TO but no MENTIONS."""
    res, corpus = result
    non_en = set(corpus.pages[corpus.pages.lang != "en"].url)
    if not non_en:
        pytest.skip("fixture has no non-en pages")
    bad = res.triples.where(
        (res.triples.pred == "MENTIONS") & res.triples.url.isin(list(non_en))
    )
    assert bad.count() == 0


def test_join_scan_fallback_matches_automaton_path(spark, corpus):
    """Big-gazetteer guard (VERDICT r2 #2): forcing the distributed
    dictionary-join scan (max_broadcast_surfaces below the vocabulary
    size) must reproduce the automaton path's triples and mentions on the
    tokenized fixture corpus — same finish_scan tail, same linking."""
    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    normal = extract_triples(spark, pages, gaz)
    fallback = extract_triples(spark, pages, gaz, max_broadcast_surfaces=1)
    t_a = set(tuple(r) for r in normal.triples.collect())
    t_b = set(tuple(r) for r in fallback.triples.collect())
    assert t_a == t_b
    m_a = set(tuple(r) for r in normal.mentions.collect())
    m_b = set(tuple(r) for r in fallback.mentions.collect())
    assert m_a == m_b


def test_release_unpersists_internal_caches(spark, corpus):
    """GraphResult.release() must drop the pipeline's persisted fan-out
    points (flat scan, canonical map, and — for graph-materializing
    callers — triples) from the CacheManager; repeated pipeline runs in
    one session (benchmark warmups, services) previously accumulated
    cache entries for the life of the session. A triples-only caller
    (default) must NOT pay the triples cache write."""
    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    lean = extract_triples(spark, pages, gaz)
    assert len(lean.cached) == 2  # flat + canon only
    lean.release()
    res = extract_triples(spark, pages, gaz, persist_triples=True)
    res.triples.count()
    assert len(res.cached) == 3
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in res.cached)
    res.release()
    assert all(
        not (df.storageLevel.useMemory or df.storageLevel.useDisk)
        for df in res.cached
    )
    # post-release actions still work (lineage recomputes)
    assert res.triples.count() > 0


def test_entry_pipeline_memo(spark):
    """__spark_entry__._run_pipeline memoizes per (session, sf_dir): the
    graph is constructed once and queried many times (reference S12 runs
    stats over the STORED graph), while fresh=True always rebuilds."""
    import __spark_entry__ as entry_mod

    a = entry_mod._run_pipeline(spark, entry_mod.SF_DEFAULT)
    b = entry_mod._run_pipeline(spark, entry_mod.SF_DEFAULT)
    assert a is b
    c = entry_mod._run_pipeline(spark, entry_mod.SF_DEFAULT, fresh=True)
    assert c is not a
    c.release()


def test_latest_captures_picks_newest_and_breaks_ties(spark):
    import datetime as dt

    from codebased_spark.sources.recrawl import latest_captures

    t0 = dt.datetime(2025, 1, 1)
    t1 = dt.datetime(2025, 2, 1)
    rows = [
        ("u1", t0, b"old"), ("u1", t1, b"new"),
        # equal timestamps: deterministic md5(content) tiebreak
        ("u2", t0, b"aaa"), ("u2", t0, b"bbb"),
        ("u3", t1, b"only"),
    ]
    got = {
        r.url: r
        for r in latest_captures(
            spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
        ).collect()
    }
    assert bytes(got["u1"].html) == b"new" and got["u1"].n_captures == 2
    import hashlib
    tie = max(b"aaa", b"bbb", key=lambda s: hashlib.md5(s).hexdigest())
    assert bytes(got["u2"].html) == tie and got["u2"].n_captures == 2
    assert bytes(got["u3"].html) == b"only" and got["u3"].n_captures == 1


def test_pipeline_dedupe_captures_ignores_stale_recrawl(spark):
    """A stale older capture of a url must not contribute triples when
    dedupe_captures=True: output equals the single-capture run."""
    import pandas as pd

    from codebased_spark.synth.pages import gen_pages

    corpus = gen_pages(n_docs=12, n_entities=10, seed=7)
    pages = corpus.pages
    stale = pages.iloc[[0]].copy()
    stale["warc_ts"] = stale["warc_ts"] - pd.Timedelta(days=30)
    stale["html"] = [pages.iloc[1]["html"]]  # different (stale) content
    stale["text"] = [pages.iloc[1]["text"]]
    gaz = spark.createDataFrame(corpus.gazetteer)

    base = extract_triples(spark, spark.createDataFrame(pages), gaz, persist=False)
    dup = extract_triples(
        spark,
        spark.createDataFrame(pd.concat([pages, stale], ignore_index=True)),
        gaz,
        persist=False,
        dedupe_captures=True,
    )
    assert set(map(tuple, dup.triples.collect())) == set(
        map(tuple, base.triples.collect())
    )


def test_synth_materialized_roundtrips_generator(spark, tmp_path):
    """synth_pages_materialized must yield exactly the generator's rows
    (benchmarks rely on the parquet boundary changing the PLAN — keeping
    the pipeline's stages in codegen — without changing the corpus)."""
    from codebased_spark.synth.scale import synth_pages_materialized, synth_pages_spark

    inline, _ = synth_pages_spark(spark, 200)
    mat, _ = synth_pages_materialized(spark, 200, base_dir=str(tmp_path / "synth"))
    # parquet reads back nullable; names and types must match exactly
    assert [(f.name, f.dataType) for f in mat.schema] == [
        (f.name, f.dataType) for f in inline.schema
    ]
    assert mat.count() == 200
    assert mat.exceptAll(inline).count() == 0
    assert inline.exceptAll(mat).count() == 0
