"""SemDeDup cluster-scoped embedding dedup (dedup/semdedup.py)."""

from __future__ import annotations

from codebased_spark.dedup.semdedup import semdedup


def _run(spark, vecs, **kw):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs], ["vec_id", "embedding"]
    )
    return {r.vec_id: (r.cluster, r.is_survivor) for r in semdedup(df, **kw).collect()}


def test_near_dup_in_same_cluster_dropped(spark):
    # two tight groups on orthogonal axes; ids 1/2 near-identical
    vecs = [
        (1, [1.0, 0.0]), (2, [0.999, 0.01]),
        (3, [0.0, 1.0]), (4, [0.01, 0.999]),
    ]
    got = _run(spark, vecs, threshold=0.99, n_cells=2, max_iter=3)
    # min-id keep-one inside each cluster
    assert got[1][1] == 1 and got[2][1] == 0
    assert got[3][1] == 1 and got[4][1] == 0
    assert got[1][0] == got[2][0] and got[3][0] == got[4][0]
    assert got[1][0] != got[3][0]


def test_cross_cluster_pairs_never_compared(spark):
    # identical vectors forced into different cells never pair: with
    # k = n = 2 every vector is its own centroid -> both survive
    vecs = [(1, [1.0, 0.0]), (2, [1.0, 0.0])]
    got = _run(spark, vecs, threshold=0.5, n_cells=2, max_iter=1)
    if got[1][0] != got[2][0]:  # separated by the fit
        assert got[1][1] == 1 and got[2][1] == 1
    else:  # co-clustered: the min-id rule applies
        assert got[1][1] == 1 and got[2][1] == 0


def test_driver_and_distributed_fits_agree(spark):
    vecs = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(40)]
    a = _run(spark, vecs, threshold=0.95, n_cells=4, max_iter=3)
    b = _run(
        spark, vecs, threshold=0.95, n_cells=4, max_iter=3,
        driver_threshold=10_000,
    )
    assert a == b
