"""SimHash near-duplicate detection — 64-bit fingerprints, banded probing.

SimHash (Charikar'02, used by Google for web dedup — Manku et al. WWW'07):
each document's shingle set is hashed; bit j of the fingerprint is the sign
of sum_{s in shingles} (bit_j(hash(s)) ? +1 : -1). Similar sets flip few
signs, so near-dupes are within small Hamming distance.

All JVM: explode shingles -> xxhash64 -> 64 conditional-sum aggregates
(one groupBy) -> assemble the bigint fingerprint with shiftleft/sum. The
per-doc work is one shuffle of (doc, 64 partial sums) with map-side combine.

Candidate generation: split the 64 bits into 16 bands of 4 bits; pairs
equal in >= 1 band cover all pairs with Hamming distance <= 15
(pigeonhole). Empirically, word-3-gram near-dupes at Jaccard 0.9+ on
short documents land at Hamming up to ~10, so the classic Manku 4x16
banding (Hamming <= 3) under-recalls here; 4-bit bands admit more random
candidates (~1-(15/16)^16 = 64% of pairs agree somewhere), which the
Hamming filter then the exact-Jaccard verification discard — output pairs
are exact, SimHash only prunes (same verified-candidates contract as
minhash.py). At web scale prefer minhash.py for 0.8-0.9 thresholds;
SimHash banding is the right tool when the target is Hamming <= 3
boilerplate (there, use N_BANDS=4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable

N_BITS = 64
N_BANDS = 16  # 4 bits per band -> catches Hamming distance <= 15 exactly


def with_simhash(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, shingles, simhash bigint) per non-empty document."""
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    h = sh.select("doc", F.explode("shingles").alias("s")).withColumn(
        "h", F.xxhash64("s")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    agg = h.groupBy("doc").agg(*bit_sums)
    fp = None
    for j in range(N_BITS):
        term = F.when(
            F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    sig = agg.select("doc", fp.alias("simhash"))
    return sh.join(sig, "doc")


def simhash_near_dupes(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    max_hamming: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verified near-dupe pairs (doc_a, doc_b, hamming, jaccard).

    Banded candidate join -> Hamming filter (bit_count of xor, JVM) ->
    exact Jaccard verification >= threshold.
    """
    signed = with_simhash(docs, n=n, id_col=id_col, text_col=text_col)
    width = N_BITS // N_BANDS
    bands = signed.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    # Hamming filter BEFORE the distinct: the 4-bit bands admit ~64% of
    # random pairs, so the filter must prune the join output stream inside
    # codegen rather than shuffling it into a distinct first.
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_val"])
        .where(F.col("a.doc") < F.col("b.doc"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            "hamming",
        )
        .distinct()
    )
    sh_a = signed.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = signed.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
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
        .select("doc_a", "doc_b", "hamming", round_stable(F.col("jaccard")).alias("jaccard"))
    )
