"""Snapshot delta (sources/delta.py), triple support / takedown cascade
(graph/confidence.py), and mention context windows (extract/contexts.py)."""

from __future__ import annotations

from codebased_spark.extract.contexts import mention_windows
from codebased_spark.graph.confidence import takedown_cascade, triple_support
from codebased_spark.sources.delta import snapshot_delta, worklist


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["url", "doc_id", "content_sha"])


def test_snapshot_delta_statuses(spark):
    prev = _snap(spark, [("a", 1, "h1"), ("b", 2, "h2"), ("c", 3, "h3")])
    curr = _snap(spark, [("b", 20, "h2"), ("c", 30, "h3x"), ("d", 40, "h4")])
    delta = snapshot_delta(prev, curr)
    got = {r.url: r.status for r in delta.collect()}
    assert got == {
        "a": "vanished",
        "b": "unchanged",  # new capture id, SAME bytes -> hash-compare skip
        "c": "changed",
        "d": "added",
    }
    # carried columns are prefixed and survive the outer join
    row = {r.url: r for r in delta.collect()}
    assert row["b"].prev_doc_id == 2 and row["b"].curr_doc_id == 20
    assert row["a"].curr_doc_id is None and row["d"].prev_doc_id is None


def test_worklist_is_added_plus_changed(spark):
    prev = _snap(spark, [("a", 1, "h1"), ("b", 2, "h2")])
    curr = _snap(spark, [("a", 10, "h1"), ("b", 20, "hX"), ("c", 30, "h3")])
    wl = sorted(r.url for r in worklist(snapshot_delta(prev, curr)).collect())
    assert wl == ["b", "c"]  # unchanged 'a' is skipped, exactly the
    # reference's stored_hash == current_hash fast path (incremental.py:37)


def _obs(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj", "url", "host"])


def test_triple_support_counters_and_confidence(spark):
    obs = _obs(
        spark,
        [
            ("e1", "P", "e2", "u1", "h1"),
            ("e1", "P", "e2", "u2", "h1"),
            ("e1", "P", "e2", "u2", "h1"),  # duplicate observation
            ("e1", "P", "e2", "u3", "h2"),
            ("e1", "P", "e3", "u1", "h1"),
        ],
    )
    got = {
        (r.subj, r.obj): (r.n_obs, r.n_urls, r.n_hosts, r.confidence)
        for r in triple_support(obs).collect()
    }
    assert got == {
        ("e1", "e2"): (4, 3, 2, 2 / 3),
        ("e1", "e3"): (1, 1, 1, 0.5),
    }


def test_takedown_cascade_fates(spark):
    obs = _obs(
        spark,
        [
            ("e1", "P", "e2", "u1", "h1"),  # weakened: h1 removed, h2 stays
            ("e1", "P", "e2", "u2", "h2"),
            ("e1", "P", "e3", "u3", "h1"),  # dropped: only support is h1
            ("e2", "P", "e3", "u4", "h2"),  # retained: untouched
            ("e2", "P", "e3", "u5", "h2"),
        ],
    )
    td = spark.createDataFrame([("h1",)], ["host"])
    got = {
        (r.subj, r.obj): (r.n_urls_before, r.n_urls_after, r.status)
        for r in takedown_cascade(obs, td).collect()
    }
    assert got == {
        ("e1", "e2"): (2, 1, "weakened"),
        ("e1", "e3"): (1, 0, "dropped"),
        ("e2", "e3"): (2, 2, "retained"),
    }


def _gaz(spark):
    return spark.createDataFrame(
        [("SURF", "ent:surf", "Thing")],
        ["surface_form", "canonical_id", "entity_type"],
    )


def test_mention_windows_arithmetic(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaa bbb SURF ccc"),  # mid-string, left window clipped to 4
            (2, "SURF tail"),  # at position 1: empty left context
            (3, "no mention here"),  # filtered out by the instr predicate
            (4, "x SURF y SURF z"),  # FIRST occurrence only
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in mention_windows(docs, _gaz(spark), width=4).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].pos, out[1].left_ctx, out[1].right_ctx) == (9, "bbb ", " ccc")
    assert (out[2].pos, out[2].left_ctx, out[2].right_ctx) == (1, "", " tai")
    assert out[4].pos == 3  # first occurrence, not the second
    assert out[1].canonical_id == "ent:surf" and out[1].entity_type == "Thing"


def test_mention_windows_width_clips_at_both_ends(spark):
    docs = spark.createDataFrame([(1, "ab SURF cd")], ["doc_id", "text"])
    r = mention_windows(docs, _gaz(spark), width=40).collect()[0]
    assert (r.pos, r.left_ctx, r.right_ctx) == (4, "ab ", " cd")
