"""SemDeDup — semantic deduplication via cluster-scoped cosine pruning
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023).

The embedding answer to the all-pairs problem: k-means the corpus
embeddings first, then compare ONLY within each cluster — semantic
near-duplicates land in the same cell by construction, so the quadratic
shrinks from N^2 to sum(|cell|^2) with |cell| ~ N/k. At 10^12 docs the
production setting scales k with N to keep cells bounded (~10^5
vectors), making the pairwise stage embarrassingly parallel per cell;
the fit itself is the engine's existing distributed Lloyd's
(similarity/kmeans.py), sample-trainable like the IVF/PQ codebooks.

Survivor rule: a vector is dropped iff some LOWER-ID vector in its
cluster matches it at cosine >= threshold — the deterministic min-id
keep-one discipline dd_clusters already uses (the paper keeps the
member farthest from the centroid; any one-per-group rule dedups the
same groups, and min-id is the one two engines reproduce bit-for-bit).

Portable mode reuses kmeans_fit(portable=True): md5-seeded init,
portable-rounded centroids, fixed iterations — so the DuckDB oracle
unrolls the identical trajectory and value-checks cluster ids AND
survivor flags exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.embedding import _as_double, dot_col, norm_col
from codebased_spark.similarity.kmeans import assign_clusters, kmeans_fit


def semdedup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_cells: int = 8,
    max_iter: int = 4,
    seed: int = 11,
    driver_threshold: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, is_survivor) for every vector.

    One k-means fit + one in-cluster pair join; the join key is the
    cluster id, so Spark shuffles each cell to one task and the
    pairwise cosine never crosses cells."""
    cents = kmeans_fit(
        emb,
        k=n_cells,
        max_iter=max_iter,
        portable=True,
        seed=seed,
        driver_threshold=driver_threshold,
        id_col=id_col,
        vec_col=vec_col,
    )
    assigned = assign_clusters(emb, cents, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"),
        _as_double(vec_col).alias("v"),
        "cluster",
    )
    n = assigned.withColumn("nrm", norm_col(F.col("v")))
    a = n.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    dups = (
        a.join(b, "cluster")
        .where(F.col("vec_a") < F.col("vec_b"))
        # zero-norm vectors (empty docs) match nothing; also keeps the
        # cosine division total under ANSI mode
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .where(
            dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= threshold
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("_dup").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "is_survivor"
            ),
        )
    )
