"""End-to-end incremental KG update job (jobs/incremental_update.py):
initial build, no-op recrawl, and a changed/added/vanished recrawl whose
final graph must equal a from-scratch rebuild on the new snapshot."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_BUCKETS, BATCH = 6, 3


def _run_job(pages_path, gaz_path, out):
    proc = subprocess.run(
        [sys.executable, "jobs/incremental_update.py",
         "--pages", pages_path, "--gazetteer", gaz_path, "--out", out,
         "--n-buckets", str(N_BUCKETS), "--batch-size", str(BATCH),
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )


def _graph_sets(spark, out):
    from codebased_spark.graph.manifest import read_graph

    nodes, edges = read_graph(spark, out)
    return (
        {r.id for r in nodes.select("id").collect()},
        {(r.src, r.dst, r.rel_type)
         for r in edges.select("src", "dst", "rel_type").collect()},
    )


def test_incremental_job_end_to_end(spark, tmp_path):
    from codebased_spark.synth.pages import gen_pages

    corpus = gen_pages(n_docs=60)
    v1 = corpus.pages
    gaz_path = str(tmp_path / "gaz")
    spark.createDataFrame(corpus.gazetteer).write.parquet(gaz_path)

    v1_path = str(tmp_path / "v1")
    spark.createDataFrame(v1).write.parquet(v1_path)
    out = str(tmp_path / "graph")

    # run 1: initial build — everything is 'added', every bucket committed
    r1 = _run_job(v1_path, gaz_path, out)
    assert r1["first_run"] and r1["added"] == 60
    assert r1["changed"] == r1["vanished"] == 0
    assert r1["buckets_processed"] == list(range(N_BUCKETS))

    # run 2: identical recrawl — url delta short-circuits before any
    # bucket hashing; graph and snapshot untouched
    r2 = _run_job(v1_path, gaz_path, out)
    assert r2["noop"] and r2["unchanged"] == 60
    assert r2["buckets_processed"] == []

    # run 3: a real recrawl — 5 urls vanish, 5 pages change content,
    # 3 new urls appear
    v2 = v1.iloc[5:].copy().reset_index(drop=True)  # first 5 urls vanish
    extra = b"<p>Acme Systems produces Flex Engine.</p></body>"
    changed_urls = list(v2["url"][:5])
    v2.loc[:4, "html"] = [h.replace(b"</body>", extra) for h in v2["html"][:5]]
    new_rows = v1.iloc[10:13].copy()
    new_rows["url"] = [u + "-new" for u in new_rows["url"]]
    import pandas as pd

    v2 = pd.concat([v2, new_rows], ignore_index=True)
    v2_path = str(tmp_path / "v2")
    spark.createDataFrame(v2).write.parquet(v2_path)

    r3 = _run_job(v2_path, gaz_path, out)
    assert not r3["noop"] and not r3["first_run"]
    assert (r3["added"], r3["changed"], r3["vanished"], r3["unchanged"]) \
        == (3, 5, 5, 50)
    assert r3["buckets_processed"]  # at least the dirty buckets rebuilt

    # the incremental end state must equal a from-scratch build on v2
    from codebased_spark.graph.manifest import run_partitioned

    fresh = str(tmp_path / "fresh")
    run_partitioned(
        spark, spark.createDataFrame(v2), spark.createDataFrame(corpus.gazetteer),
        fresh, n_buckets=N_BUCKETS, batch_size=BATCH,
    )
    assert _graph_sets(spark, out) == _graph_sets(spark, fresh)

    # changed pages' new mentions are present; vanished urls' pages gone
    node_ids, _ = _graph_sets(spark, out)
    assert all(f"page:{u}" in node_ids for u in changed_urls)
    assert all(f"page:{u}" not in node_ids for u in v1["url"][:5])
