"""k-means IVF: recovers separated blobs, deterministic, ANN probe works."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from codebased_spark.similarity.kmeans import (
    ann_ivf_kmeans_topk,
    assign_clusters,
    kmeans_fit,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.RandomState(5)
    rows = []
    centers = [np.zeros(8), np.full(8, 10.0), np.concatenate([np.full(4, -10.0), np.zeros(4)])]
    for i in range(150):
        c = i % 3
        v = centers[c] + 0.5 * rng.randn(8)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "true_c"])


def test_kmeans_recovers_blobs(blobs):
    cents = kmeans_fit(blobs, k=3, max_iter=15)
    assigned = assign_clusters(blobs, cents).select("vec_id", "cluster", "true_c")
    # each learned cluster maps 1:1 to one true blob
    m = assigned.groupBy("true_c").agg(
        F.countDistinct("cluster").alias("n"),
        F.count(F.lit(1)).alias("sz"),
    )
    assert all(r.n == 1 for r in m.collect())
    pairs = assigned.select("cluster", "true_c").distinct()
    assert pairs.count() == 3  # bijection


def test_kmeans_deterministic(blobs):
    a = kmeans_fit(blobs, k=3, max_iter=15)
    b = kmeans_fit(blobs, k=3, max_iter=15)
    assert a == b


def test_ann_ivf_kmeans_probe(blobs):
    got = ann_ivf_kmeans_topk(blobs, query_id=0, k=5, n_cells=3, n_probe=1)
    rows = got.collect()
    assert len(rows) == 5
    # all results come from the query's own blob (true_c == 0 => ids % 3 == 0)
    assert all(r.vec_id % 3 == 0 for r in rows)
    assert all(rows[i].cos_sim >= rows[i + 1].cos_sim for i in range(4))
