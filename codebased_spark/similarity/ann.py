"""Approximate-nearest-neighbor search over an embedding column.

- ann_bruteforce_topk: exact cosine top-k against a query vector — the
  baseline every ANN variant is judged against. The query vector is a
  broadcast literal; the scan is embarrassingly parallel, the only shuffle
  is the TakeOrderedAndProject for top-k (driver receives k rows, not N).

- ann_ivf_topk: IVF-style two-stage search — coarse quantizer (centroid
  per partition label) picks the nearest cell(s), fine search runs exact
  cosine only inside those cells. Deterministic: centroids are plain
  averages, probe order ties broken by label. At 10^12 vectors the coarse
  table is a broadcast dim (n_cells rows) and partition pruning on the
  cell id makes the fine scan read ~1/n_cells of the data.

Cosine math lives in dedup.embedding (zip_with/aggregate, JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.embedding import _as_double, cosine_col
from codebased_spark.util import round_stable


def _query_vec(emb: DataFrame, query_id: int, id_col: str, vec_col: str):
    row = emb.where(F.col(id_col) == query_id).select(vec_col).head()
    if row is None:
        raise ValueError(f"query vector id {query_id} not found")
    return [float(x) for x in row[0]]


def ann_bruteforce_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs the embedding of `query_id` (excluded itself)."""
    qv = _query_vec(emb, query_id, id_col, vec_col)
    qcol = F.array(*[F.lit(x) for x in qv])
    return (
        emb.where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            round_stable(cosine_col(_as_double(vec_col), qcol)).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF search: probe the n_probe nearest coarse cells, exact inside.

    Uses `cell_col` as the inverted-list assignment (in a full system this
    is a k-means assignment materialized at index-build time; the driver
    tables ship one as `label`). Centroid = element-wise mean per cell.
    """
    qv = _query_vec(emb, query_id, id_col, vec_col)
    qcol = F.array(*[F.lit(x) for x in qv])

    flat = emb.select(
        F.col(cell_col), F.posexplode(_as_double(vec_col)).alias("i", "val")
    )
    centroids = (
        flat.groupBy(cell_col, "i")
        .agg(F.avg("val").alias("v"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("sv"))
        .select(cell_col, F.transform("sv", lambda s: s["v"]).alias("centroid"))
    )
    probes = [
        r[0]
        for r in centroids.select(
            cell_col, cosine_col(F.col("centroid"), qcol).alias("c")
        )
        .orderBy(F.desc("c"), F.asc(cell_col))
        .limit(n_probe)
        .collect()
    ]
    return (
        emb.where(F.col(cell_col).isin(probes))  # partition-prunable predicate
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            round_stable(cosine_col(_as_double(vec_col), qcol)).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
