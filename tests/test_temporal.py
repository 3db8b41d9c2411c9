"""Temporal fact lifespans (graph/temporal.py)."""

from __future__ import annotations

from codebased_spark.graph.temporal import fact_lifespans


def test_fact_lifespans_windows_and_currency(spark):
    # url u: captures at ts 1,2,3. Fact A in all three; fact B vanishes
    # after ts 2 (retraction); fact C appears only in the latest.
    obs = spark.createDataFrame(
        [
            ("u", 1, "A"), ("u", 2, "A"), ("u", 3, "A"),
            ("u", 1, "B"), ("u", 2, "B"),
            ("u", 3, "C"),
            ("u", 3, "C"),  # duplicate observation inside one capture
            ("v", 5, "A"),
        ],
        ["url", "ts", "entity_id"],
    )
    got = {
        (r.url, r.entity_id): (r.first_seen, r.last_seen, r.n_obs, r.is_current)
        for r in fact_lifespans(obs, ts_col="ts").collect()
    }
    assert got == {
        ("u", "A"): (1, 3, 3, 1),
        ("u", "B"): (1, 2, 2, 0),  # vanished: not in latest capture
        ("u", "C"): (3, 3, 1, 1),  # per-capture duplicates count once
        ("v", "A"): (5, 5, 1, 1),
    }


def test_fact_lifespans_mentionless_latest_capture_retracts(spark):
    """Retraction by silence (ADVICE r3): if the url's NEWEST capture
    asserts no facts at all, every fact is stale — which the obs-derived
    fallback cannot see. Passing the full capture table fixes it."""
    caps = spark.createDataFrame(
        [("u", 1, "x"), ("u", 2, "x"), ("u", 3, "")], ["url", "ts", "text"]
    )
    # only captures 1 and 2 produced observations; capture 3 is silent
    obs = spark.createDataFrame(
        [("u", 1, "A"), ("u", 2, "A")], ["url", "ts", "entity_id"]
    )
    with_caps = {
        r.entity_id: r.is_current
        for r in fact_lifespans(obs, ts_col="ts", captures=caps).collect()
    }
    assert with_caps == {"A": 0}  # latest capture (ts 3) no longer asserts A
    # the documented obs-only fallback misses the retraction
    fallback = {
        r.entity_id: r.is_current
        for r in fact_lifespans(obs, ts_col="ts").collect()
    }
    assert fallback == {"A": 1}


def test_fact_lifespans_multi_fact_columns(spark):
    obs = spark.createDataFrame(
        [("u", 1, "s", "p", "o"), ("u", 2, "s", "p", "o"), ("u", 2, "s", "p", "o2")],
        ["url", "ts", "subj", "pred", "obj"],
    )
    rows = fact_lifespans(obs, ts_col="ts", fact_cols=("subj", "pred", "obj")).collect()
    got = {(r.subj, r.pred, r.obj): (r.first_seen, r.last_seen, r.is_current) for r in rows}
    assert got == {("s", "p", "o"): (1, 2, 1), ("s", "p", "o2"): (2, 2, 1)}
