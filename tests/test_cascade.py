"""dedup_cascade: tier attribution, exact-pair linearity, oracle reuse."""

from pyspark.sql import functions as F

from codebased_spark.dedup.cascade import dedup_cascade, exact_pairs


def test_exact_pairs_linear_in_group(spark):
    # 4-way identical group -> 3 (rep, member) rows, NOT C(4,2)=6
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(4)] + [(9, "different")],
        ["doc_id", "text"],
    )
    rows = exact_pairs(docs).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(0, 1), (0, 2), (0, 3)}


def test_stage_attribution(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact dup of 1
            (3, base + " lambda"),          # near-dup of 1/2 (high jaccard)
            (4, "totally unrelated words about other topics entirely now"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup_cascade(
            docs, n=2, minhash_threshold=0.5, max_hamming=8,
            min_jaccard=0.3, portable_hash=True,
        ).collect()
    }
    ex = out[(1, 2)]
    # identical texts: caught by every tier, attributed to 'exact'
    assert (ex["in_exact"], ex["stage"]) == (1, "exact")
    assert ex["in_minhash"] == 1
    near = out[(1, 3)]
    assert (near["in_exact"], near["stage"]) == (0, "minhash")
    assert not any(4 in k for k in out)


def test_component_oracles_single_scan():
    """The cascade oracle retargets each component oracle at the
    clone-extended corpus by substituting its ONE documents reference —
    pin that count so a component rewrite can't silently break it."""
    from codebased_spark import dataops

    for k in ("dd_minhash_lsh", "dd_simhash"):
        assert dataops.ORACLES[k].count("FROM documents") == 1, k
