"""fact_churn statuses and dedup_savings accounting."""

from pyspark.sql import functions as F

from codebased_spark.dedup.clusters import dedup_savings
from codebased_spark.graph.temporal import fact_churn


def test_fact_churn_statuses(spark):
    prev = spark.createDataFrame(
        [("u1", "E1"), ("u1", "E2"), ("u2", "E1"), ("u1", "E2")],  # dup obs ok
        ["url", "entity_id"],
    )
    curr = spark.createDataFrame(
        [("u1", "E1"), ("u1", "E3"), ("u2", "E1")],
        ["url", "entity_id"],
    )
    out = {
        (r["url"], r["entity_id"]): r["status"]
        for r in fact_churn(prev, curr).collect()
    }
    assert out == {
        ("u1", "E1"): "retained",
        ("u1", "E2"): "vanished",
        ("u1", "E3"): "added",
        ("u2", "E1"): "retained",
    }


def test_dedup_savings_accounting(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),        # survivor of cluster {1,2}
            (2, "en", "a b c"),        # dropped, 3 tokens
            (3, "en", "x  y"),         # singleton (double space -> 2 tokens)
            (4, "de", "p q r s"),      # singleton
        ],
        ["doc_id", "lang", "text"],
    )
    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 3, True), (4, 4, True)],
        ["doc_id", "cluster_id", "is_survivor"],
    )
    out = {r["lang"]: r for r in dedup_savings(docs, clusters).collect()}
    en = out["en"]
    assert (en["n_docs"], en["n_dropped"]) == (3, 1)
    assert (en["tokens_total"], en["tokens_dropped"]) == (8, 3)
    de = out["de"]
    assert (de["n_docs"], de["n_dropped"], de["tokens_dropped"]) == (1, 0, 0)


def test_dedup_savings_int_flag(spark):
    """Accepts the materialized int form of is_survivor too."""
    docs = spark.createDataFrame([(1, "en", "a"), (2, "en", "a")],
                                 ["doc_id", "lang", "text"])
    clusters = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 0)], ["doc_id", "cluster_id", "is_survivor"]
    )
    row = dedup_savings(docs, clusters).collect()[0]
    assert (row["n_dropped"], row["tokens_dropped"]) == (1, 1)
