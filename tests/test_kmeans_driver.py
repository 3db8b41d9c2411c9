"""Adaptive driver-side k-means fit (similarity/kmeans.py) — the twin
must be bit-identical to the distributed portable path, same discipline
as the pagerank/HITS driver-path equality tests."""

from __future__ import annotations

from codebased_spark.similarity.kmeans import kmeans_fit
from codebased_spark.similarity.pq import ann_pq_topk


def _emb(spark, n=60, dim=8, seed=3):
    rows = [
        (
            i,
            [((i * 31 + d * 17 + seed) % 97) / 97.0 for d in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_driver_fit_equals_distributed_fit(spark):
    emb = _emb(spark)
    dist = kmeans_fit(emb, k=4, max_iter=3, seed=11, portable=True)
    drv = kmeans_fit(
        emb, k=4, max_iter=3, seed=11, portable=True, driver_threshold=10_000
    )
    assert drv == dist


def test_threshold_exceeded_falls_back_to_distributed(spark):
    emb = _emb(spark, n=30)
    dist = kmeans_fit(emb, k=3, max_iter=2, seed=7, portable=True)
    # threshold below the row count -> must take the distributed path
    over = kmeans_fit(
        emb, k=3, max_iter=2, seed=7, portable=True, driver_threshold=10
    )
    assert over == dist


def test_pq_topk_identical_under_driver_fit(spark):
    emb = _emb(spark, n=80, dim=16)
    kw = dict(query_id=0, topk=5, m=4, k=4, dim=16, n_iter=2, seed=11)
    dist = [tuple(r) for r in ann_pq_topk(emb, **kw).collect()]
    drv = [
        tuple(r)
        for r in ann_pq_topk(emb, driver_threshold=10_000, **kw).collect()
    ]
    assert drv == dist


def test_fewer_rows_than_k(spark):
    emb = _emb(spark, n=2)
    drv = kmeans_fit(
        emb, k=4, max_iter=2, seed=11, portable=True, driver_threshold=100
    )
    dist = kmeans_fit(emb, k=4, max_iter=2, seed=11, portable=True)
    assert drv == dist
    assert len(drv) == 2


def test_ivfpq_probing_all_cells_equals_plain_pq(spark):
    from codebased_spark.similarity.pq import ann_ivfpq_topk

    emb = _emb(spark, n=80, dim=16)
    kw = dict(query_id=0, topk=5, m=4, k=4, dim=16, n_iter=2, seed=11)
    pq = [tuple(r) for r in ann_pq_topk(emb, **kw).collect()]
    full_probe = [
        tuple(r)
        for r in ann_ivfpq_topk(
            emb, n_cells=4, n_probe=4, n_iter_cells=2, **kw
        ).collect()
    ]
    assert full_probe == pq  # probing every cell degenerates to plain PQ


def test_ivfpq_prunes_to_probed_cells(spark):
    from codebased_spark.similarity.kmeans import assign_clusters, kmeans_fit
    from codebased_spark.similarity.pq import ann_ivfpq_topk

    emb = _emb(spark, n=80, dim=16)
    kw = dict(query_id=0, topk=20, m=4, k=4, dim=16, n_iter=2, seed=11)
    out = ann_ivfpq_topk(emb, n_cells=4, n_probe=1, n_iter_cells=2, **kw)
    got_ids = {r.vec_id for r in out.collect()}
    cells = kmeans_fit(emb, k=4, max_iter=2, seed=11, portable=True)
    assigned = {
        r.vec_id: r.cluster
        for r in assign_clusters(emb, cells).select("vec_id", "cluster").collect()
    }
    probed = {assigned[i] for i in got_ids}
    assert len(probed) == 1  # every result lives in the single probed cell
    assert 0 not in got_ids  # the query itself is excluded
