"""Embedding-cosine near-duplicate detection.

Two paths over an `array<float>` embedding column:

- exact: all-pairs cosine via a join on a coarse block (or full cross join
  for the brute-force twin). Cosine is computed JVM-side with
  zip_with + aggregate over doubles — no Python, no UDF.
- lsh: random-hyperplane signatures (sign-bit sketch, Charikar'02) bucket
  the vectors so only same-bucket pairs are compared. Hyperplanes are
  seeded numpy constants broadcast as literal arrays — deterministic across
  runs and executors.

At 100 TB the exact path is the oracle/baseline; the LSH path's shuffle is
O(N * n_tables * (1 + n_bits)) bucket/probe rows instead of O(N^2) pairs,
with 2^n_bits buckets per table bounding same-bucket collision mass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot_col(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order double dot product (same fold order as the oracle).

    With `dim` known, the sum is unrolled into one codegen expression of
    element_at products — zip_with+aggregate allocates a dim-length array
    per row-pair, which dominates brute-force pair scans (measured ~2x on
    the sf0.1 cross join). Both forms fold left-to-right, so they are
    IEEE-identical to each other and to the SQL oracle.
    """
    if dim is not None:
        acc = F.element_at(a, 1) * F.element_at(b, 1)
        for i in range(2, dim + 1):
            acc = acc + F.element_at(a, i) * F.element_at(b, i)
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot_col(a, a, dim))


def cosine_col(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_col(a, b, dim) / (norm_col(a, dim) * norm_col(b, dim))


def embedding_near_dupes_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Brute-force cosine pairs >= threshold: (vec_a, vec_b, cos_sim)."""
    a = emb.select(
        F.col(id_col).alias("vec_a"), _as_double(vec_col).alias("va")
    ).withColumn("na", norm_col(F.col("va"), dim))
    b = emb.select(
        F.col(id_col).alias("vec_b"), _as_double(vec_col).alias("vb")
    ).withColumn("nb", norm_col(F.col("vb"), dim))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", dot_col(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", round_stable(F.col("cos_sim")).alias("cos_sim"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim)


def signbit_signature_col(vec: Column, planes: np.ndarray) -> Column:
    """int bucket id: sign bits of <vec, plane_i> packed into a long.

    JVM-only form, kept for few-bit signatures; for n_tables*n_bits in the
    hundreds use `_signatures_udf` — the unrolled plane-dot expressions blow
    past the JIT method-size limit and fall back to interpreted eval.
    """
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_col(vec, lit_plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def _signatures_udf(planes_stack: np.ndarray, n_tables: int, n_bits: int):
    """Arrow-batched all-tables signature: one numpy matmul per batch.

    (batch, dim) @ (dim, n_tables*n_bits) -> sign bits -> n_tables packed
    ints. The signature stage is linear in N and runs once per vector;
    BLAS beats 128 unrolled codegen plane-dots by an order of magnitude
    and keeps the plan small (the unrolled form trips the JVM's 64KB
    method limit and de-optimizes the whole stage to interpreted eval).
    """
    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf("array<int>")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.array(v.tolist(), dtype=np.float64)
        bits = (mat @ planes_stack.T) >= 0  # (batch, n_tables*n_bits)
        sigs = (bits.reshape(-1, n_tables, n_bits) * weights).sum(axis=2)
        return pd.Series(list(sigs.astype(np.int32)))

    return _sig


def embedding_near_dupes_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 16,
    n_tables: int = 8,
    multiprobe: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Hyperplane-LSH candidates verified with exact cosine >= threshold.

    Recall math (p = P(bit agrees) = 1 - theta/pi): with 16-bit buckets and
    multiprobe=1, a table finds the pair if the signatures differ in <= 1
    bit: p^16 + 16 p^15 (1-p). At cos 0.97 (p ~= 0.922) that is ~0.60 per
    table, so 8 independent tables miss with (0.40)^8 ~= 6e-4; at cos 0.99
    (p ~= 0.955) the per-table hit is ~0.84 and the miss rate ~4e-7. Every
    candidate is exact-verified, so output precision is 1.0 by construction
    and recall is the only tunable.

    Scale shape: 2^16 buckets per table keeps same-bucket collision mass
    ~N^2/65536 per table even on adversarial data, and the probe explosion
    is a fixed n_tables*(1+n_bits) rows per vector — linear in N, no
    all-pairs stage anywhere. Raising n_bits with log2(N) (and multiprobe
    with the recall target) is the 100-TB knob.
    """
    vecs = emb.select(
        F.col(id_col).alias("vec"), _as_double(vec_col).alias("v")
    ).withColumn("nrm", norm_col(F.col("v"), dim))
    planes_stack = np.vstack(
        [_hyperplanes(dim, n_bits, seed=seed + t) for t in range(n_tables)]
    )
    sig = _signatures_udf(planes_stack, n_tables, n_bits)
    sigs = vecs.select("vec", sig(F.col("v")).alias("sigs"))
    home = sigs.select(
        "vec", F.posexplode("sigs").alias("table_idx", "bucket")
    )
    if multiprobe > 0:
        # probe buckets at Hamming distance 1 from the signature (one side
        # only: a pair differing in bit j meets as home_a x probe_b(j))
        probes = home.select(
            "vec",
            "table_idx",
            F.explode(
                F.array(
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << j))
                        for j in range(n_bits)
                    ]
                )
            ).alias("bucket"),
        )
        right = home.unionByName(probes)
    else:
        right = home
    cand = (
        home.alias("a")
        .join(right.alias("b"), ["table_idx", "bucket"])
        .where(F.col("a.vec") < F.col("b.vec"))
        .select(F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"))
        .distinct()
    )
    va = vecs.select(F.col("vec").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = vecs.select(F.col("vec").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos_sim", dot_col(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", round_stable(F.col("cos_sim")).alias("cos_sim"))
    )
