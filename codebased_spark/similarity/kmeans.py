"""Distributed k-means (Lloyd's) for IVF coarse quantization.

The iterative-algorithm pattern on DataFrames: per round, (1) assign each
vector to its nearest centroid — centroids are a k x dim literal array
broadcast in the plan, the argmin is an array_min over (distance, idx)
structs, all JVM; (2) recompute centroids with one groupBy (cluster,
dimension) shuffle; (3) driver collects the k x dim means (tiny) and
checks movement for convergence. Per-iteration cost: one shuffle of
(cluster, i, partial sums) with map-side combine — the corpus is never
collected.

Determinism: init picks the k vectors with the smallest xxhash64(id, seed)
(a seeded sample that is stable across partitioning/retries), and ties in
the argmin break toward the lower cluster index.

This is the index-build step for IVF ANN search (ann.py): cells = k-means
clusters instead of a precomputed label column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.embedding import _as_double
from codebased_spark.util import round_stable


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """emb + `cluster` column = argmin_c ||v - centroid_c||^2 (JVM argmin)."""
    v = _as_double(vec_col)
    scored = F.array(
        *[
            F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return emb.withColumn("cluster", F.array_min(scored)["i"])


def _kmeans_fit_driver(
    rows: list[tuple], k: int, max_iter: int, seed: int, round_decimals: int
) -> list[list[float]]:
    """Driver-side twin of the portable distributed fit — identical
    trajectory by construction: same (md5(id || ':' || seed), id) init
    order, same left-fold squared distance in dimension order, same
    low-index tie-break, same per-round floor(x*10^d + 0.5) centroid
    rounding (which absorbs the summation-order ulp noise exactly as it
    does between Spark and DuckDB). Pinned equal to the distributed path
    in tests/test_kmeans_driver.py."""
    import hashlib
    import math

    order = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"{r[0]}:{seed}".encode()).hexdigest(),
            r[0],
        ),
    )
    centroids = [[float(x) for x in r[1]] for r in order[:k]]
    if not centroids:
        return []
    dim = len(centroids[0])
    scale = 10**round_decimals
    for _ in range(max_iter):
        sums = [[0.0] * dim for _ in range(len(centroids))]
        counts = [0] * len(centroids)
        for _id, v in rows:
            best, bd = 0, None
            for ci, c in enumerate(centroids):
                d = 0.0
                for a, b in zip(v, c):
                    d += (a - b) * (a - b)
                if bd is None or d < bd:
                    bd, best = d, ci
            counts[best] += 1
            s = sums[best]
            for i, a in enumerate(v):
                s[i] += a
        for ci in range(len(centroids)):
            if counts[ci]:
                centroids[ci] = [
                    math.floor(s / counts[ci] * scale + 0.5) / scale
                    for s in sums[ci]
                ]
    return centroids


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    portable: bool = False,
    round_decimals: int = 6,
    driver_threshold: int = 0,
) -> list[list[float]]:
    """Fit k centroids; returns them as plain lists (the tiny model).

    The input is persisted for the duration of the fit — every Lloyd's
    round scans it once, and without the cache each round re-reads (and
    re-decodes) the source parquet.

    ``portable=True`` makes the WHOLE trajectory reproducible by an ANSI
    SQL engine on the same table, which is what upgrades the driver row
    from rows-only to value-checked: (1) init picks the k vectors with
    the smallest (md5(id || ':' || seed), id) — md5 exists verbatim on
    both engines, unlike xxhash64; (2) every centroid update is rounded
    to `round_decimals` via the portable floor(x*10^d + 0.5) rule, so
    cross-engine avg() summation-order noise (~1e-15) cannot leak into
    the next assignment; (3) the run is exactly `max_iter` rounds — no
    movement-based early exit (the fixed-iteration discipline g_pagerank
    already uses to stay SQL-expressible). Assignment argmin operates on
    identical (rounded-centroid, raw-vector) inputs on both engines, so
    ties and flips cannot diverge outside measure-zero distance ties.

    ``driver_threshold`` (portable mode only): when the input has at most
    that many rows, collect it ONCE and run the identical fixed-iteration
    Lloyd's driver-side — a codebook fit over a bounded sample is a
    driver-sized problem, and the distributed twin's per-round job
    overhead (m x max_iter shuffle jobs for PQ) dwarfs the arithmetic at
    that size. Same adaptive pattern as pagerank/HITS; the distributed
    path stays the default (threshold 0) and is what a whole-corpus fit
    uses.
    """
    from pyspark import StorageLevel

    from codebased_spark.util import round_stable

    if portable and driver_threshold:
        rows = (
            emb.select(id_col, _as_double(vec_col).alias("v"))
            .limit(driver_threshold + 1)
            .collect()
        )
        if len(rows) <= driver_threshold:
            return _kmeans_fit_driver(
                [(r[0], list(r[1])) for r in rows],
                k=k, max_iter=max_iter, seed=seed,
                round_decimals=round_decimals,
            )

    emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
    if portable:
        init_order = [
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            F.col(id_col),
        ]
    else:
        init_order = [F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)]
    init_rows = (
        emb.select(id_col, _as_double(vec_col).alias("v"))
        .orderBy(*init_order)
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r.v] for r in init_rows]
    for _ in range(max_iter):
        assigned = assign_clusters(emb, centroids, vec_col=vec_col)
        flat = assigned.select(
            "cluster", F.posexplode(_as_double(vec_col)).alias("i", "val")
        )
        mean_col = F.avg("val")
        if portable:
            mean_col = round_stable(mean_col, round_decimals)
        means = (
            flat.groupBy("cluster", "i")
            .agg(mean_col.alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("sv"))
            .select("cluster", F.transform("sv", lambda s: s["m"]).alias("c"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r.cluster] = [float(x) for x in r.c]
        movement = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if not portable and movement < tol:
            break
    emb.unpersist()
    return centroids


def ann_ivf_kmeans_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    portable: bool = False,
    max_iter: int = 10,
    driver_threshold: int = 0,
) -> DataFrame:
    """IVF ANN with a learned k-means coarse quantizer.

    Index build (kmeans_fit + assignment) would be materialized once and
    reused in production; probing searches the n_probe nearest cells
    exactly. With ``portable=True`` the fit is the fixed-iteration
    SQL-reproducible variant (see kmeans_fit), which is how the driver
    row became value-checked in r3 — the oracle unrolls the identical
    Lloyd's rounds as chained CTEs.
    """
    from codebased_spark.dedup.embedding import cosine_col
    from codebased_spark.similarity.ann import _query_vec

    centroids = kmeans_fit(
        emb, k=n_cells, id_col=id_col, vec_col=vec_col, seed=seed,
        portable=portable, max_iter=max_iter,
        driver_threshold=driver_threshold,
    )
    qv = _query_vec(emb, query_id, id_col, vec_col)
    dists = [
        sum((a - b) ** 2 for a, b in zip(qv, c)) for c in centroids
    ]
    probes = sorted(range(len(dists)), key=lambda i: (dists[i], i))[:n_probe]
    qcol = F.array(*[F.lit(x) for x in qv])
    assigned = assign_clusters(emb, centroids, vec_col=vec_col)
    return (
        assigned.where(F.col("cluster").isin(probes))
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            round_stable(cosine_col(_as_double(vec_col), qcol)).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
