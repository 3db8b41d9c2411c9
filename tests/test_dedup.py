"""Dedup operator tests: each approximate candidate path must agree with
its brute-force twin on a corpus with planted near-duplicates."""

from __future__ import annotations

import pandas as pd
import pytest

from codebased_spark.dedup.embedding import (
    embedding_near_dupes_exact,
    embedding_near_dupes_lsh,
)
from codebased_spark.dedup.exact import exact_dedup, exact_duplicate_pairs
from codebased_spark.dedup.minhash import minhash_near_dupes
from codebased_spark.dedup.ngram import (
    ngram_jaccard_bruteforce,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)
from codebased_spark.dedup.simhash import simhash_near_dupes

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega one two three four five six"
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """10 distinct docs + near-dupe of doc 0 + exact dupes of docs 1, 2."""
    rows = []
    words = BASE.split()
    for i in range(10):
        # rotate so docs are pairwise dissimilar
        rot = words[3 * i:] + words[: 3 * i]
        rows.append((i, " ".join(rot) + f" suffix{i} tail{i} end{i}"))
    near = rows[0][1].split()
    near[5] = "REPLACED"
    rows.append((100, " ".join(near)))  # near-dupe of 0
    rows.append((101, rows[1][1]))  # exact dupe of 1
    rows.append((102, rows[2][1]))  # exact dupe of 2
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(dup_docs):
    surv = exact_dedup(dup_docs).toPandas()
    assert len(surv) == 11  # 13 docs, 2 exact dupes collapsed
    assert set(surv[surv.group_size == 2].doc_id) == {1, 2}
    pairs = exact_duplicate_pairs(dup_docs).toPandas()
    assert {(r.doc_id, r.dup_of) for r in pairs.itertuples()} == {(101, 1), (102, 2)}


def test_ngram_variants_equal_bruteforce(dup_docs):
    fast = ngram_jaccard_pairs(dup_docs, n=3, threshold=0.5).toPandas()
    pref = ngram_jaccard_pairs_prefix(dup_docs, n=3, threshold=0.5).toPandas()
    slow = ngram_jaccard_bruteforce(dup_docs, n=3, threshold=0.5).toPandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(fast) == key(slow)
    assert key(pref) == key(slow)
    got = {(a, b) for a, b, _ in fast.values.tolist()}
    assert {(0, 100), (1, 101), (2, 102)} <= got


def test_ngram_prefix_lossless_at_exact_threshold_boundary(spark):
    """ADVICE r2: double(0.8) > 0.8, so ceil(t*sz) at an exact integer
    boundary rounded one too high — shortening the prefix below the
    lossless minimum and dropping pairs with Jaccard EXACTLY t. The
    killing case is the LENGTH filter: |A|=10 shingles, B = prefix of A
    with |B|=8, inter=8 -> J = 8/10 = 0.8 = t, but the unguarded bound
    requires |B| >= ceil(8.0000000000000004) = 9 and prunes the pair."""
    toks = [f"w{i}" for i in range(12)]
    rows = [
        (0, " ".join(toks)),          # 12 tokens -> 10 shingles
        (1, " ".join(toks[:10])),     # 10 tokens -> 8 shingles, all shared
    ]
    # pad with unrelated docs so the df-ordering stage is non-trivial
    rows += [(10 + i, f"x{i} y{i} z{i} q{i} r{i} s{i}") for i in range(5)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for t in (0.8, 0.6, 0.5):
        pref = ngram_jaccard_pairs_prefix(docs, n=3, threshold=t).toPandas()
        slow = ngram_jaccard_bruteforce(docs, n=3, threshold=t).toPandas()
        key = lambda df: sorted(map(tuple, df.values.tolist()))
        assert key(pref) == key(slow), f"threshold {t}"
        assert (0, 1) in {(a, b) for a, b, _ in pref.values.tolist()}


def test_minhash_lsh_finds_planted_pairs(dup_docs):
    got = minhash_near_dupes(dup_docs, n=3, threshold=0.8).toPandas()
    pairs = {(a, b) for a, b, _ in got.values.tolist()}
    assert (1, 101) in pairs and (2, 102) in pairs  # jaccard 1.0, always caught
    oracle = ngram_jaccard_bruteforce(dup_docs, n=3, threshold=0.8).toPandas()
    assert pairs == {(a, b) for a, b, _ in oracle.values.tolist()}


def test_simhash_finds_planted_pairs(dup_docs):
    got = simhash_near_dupes(dup_docs, n=3, max_hamming=3, min_jaccard=0.5).toPandas()
    pairs = {(a, b) for a, b, *_ in got.values.tolist()}
    assert (1, 101) in pairs and (2, 102) in pairs  # hamming 0
    # every emitted pair is exact-verified
    oracle = ngram_jaccard_bruteforce(dup_docs, n=3, threshold=0.5).toPandas()
    assert pairs <= {(a, b) for a, b, _ in oracle.values.tolist()}


@pytest.mark.parametrize("portable", [False, True])
def test_simhash_banding_equals_bruteforce_hamming(dup_docs, portable):
    """Pigeonhole guarantee: 4 wide bands find EVERY pair within Hamming 3 —
    banded output must equal the brute-force Hamming cross join."""
    from pyspark.sql import functions as F

    from codebased_spark.dedup.simhash import with_simhash

    sig = with_simhash(dup_docs, n=3, portable_hash=portable).select("doc", "simhash")
    a = sig.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .toPandas()
    )
    banded = simhash_near_dupes(
        dup_docs, n=3, max_hamming=3, min_jaccard=0.0, portable_hash=portable
    ).toPandas()[["doc_a", "doc_b", "hamming"]]
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(banded) == key(brute)
    assert len(brute) >= 2  # the exact dupes are in the Hamming<=3 regime


@pytest.fixture(scope="module")
def vec_df(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(8, 16).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(8)]
    # vector 100 = tiny perturbation of vector 0 (cos ~ 0.999)
    rows.append((100, (base[0] + 0.01 * rng.randn(16).astype("float32")).tolist()))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_exact_and_lsh(vec_df):
    exact = embedding_near_dupes_exact(vec_df, threshold=0.95).toPandas()
    assert [(r.vec_a, r.vec_b) for r in exact.itertuples()] == [(0, 100)]
    lsh = embedding_near_dupes_lsh(
        vec_df, threshold=0.95, n_bits=8, n_tables=6, dim=16
    ).toPandas()
    assert [(r.vec_a, r.vec_b) for r in lsh.itertuples()] == [(0, 100)]


def test_embedding_lsh_recall_on_planted_twins(spark):
    """LSH (default 16-bit/8-table/multiprobe-1) must equal brute force on a
    corpus with 30 planted near-dup pairs at cos ~0.97 — the non-vacuous
    recall gate (VERDICT r1 #1)."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.randn(300, 64)
    rows = [(i, base[i].tolist()) for i in range(300)]
    for i in range(30):
        twin = base[i] * (1.0 + 0.15 * rng.choice([-2, -1, 0, 1, 2], size=64))
        rows.append((1000 + i, twin.tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = embedding_near_dupes_exact(df, threshold=0.9).toPandas()
    lsh = embedding_near_dupes_lsh(df, threshold=0.9).toPandas()
    key = lambda d: sorted(map(tuple, d.values.tolist()))
    assert len(exact) >= 25  # the plant actually created true pairs
    assert key(lsh) == key(exact)


def test_dedup_clusters_keep_one(spark):
    """pairs + CC -> (doc_id, cluster_id, is_survivor): transitive pairs
    merge into one cluster labeled by its min id; singletons survive."""
    import pandas as pd

    from codebased_spark.dedup.clusters import dedup_clusters, surviving_docs

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 9], "text": ["x"] * 6})
    )
    # 1-2, 2-3 chain; 4-5 pair; 9 singleton
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 4], "doc_b": [2, 3, 5]})
    )
    got = {
        r.doc_id: (r.cluster_id, r.is_survivor)
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (4, False), 9: (9, True),
    }
    kept = sorted(r.doc_id for r in surviving_docs(docs, pairs).collect())
    assert kept == [1, 4, 9]


def test_dedup_clusters_end_to_end_minhash(dup_docs):
    """Composed with the minhash pair emitter on the planted-dupe corpus:
    exact dupes collapse, everything else survives."""
    from codebased_spark.dedup.clusters import dedup_clusters

    pairs = minhash_near_dupes(dup_docs, n=3, threshold=0.8)
    got = dedup_clusters(dup_docs, pairs).toPandas()
    by_id = {r.doc_id: r for r in got.itertuples()}
    assert by_id[101].cluster_id == 1 and not by_id[101].is_survivor
    assert by_id[102].cluster_id == 2 and not by_id[102].is_survivor
    assert by_id[1].is_survivor and by_id[2].is_survivor
    # every doc appears exactly once
    assert len(got) == dup_docs.count()
