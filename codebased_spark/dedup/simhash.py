"""SimHash near-duplicate detection — Manku-style banded Hamming probing.

SimHash (Charikar'02; Manku et al. WWW'07 — Google's web-crawl dedup):
each document's shingle set is hashed; bit j of the fingerprint is the sign
of sum_{s in shingles} (bit_j(hash(s)) ? +1 : -1). Near-identical sets flip
few signs, so boilerplate/near-identical docs sit at small Hamming distance.

SCOPE (round-2 re-scoping, VERDICT r1 #2): SimHash banding is the right
tool for the *Hamming <= k, small k* regime — Manku's production setting is
64-bit fingerprints at Hamming <= 3. Splitting the fingerprint into
`n_bands = max_hamming + 1` wide bands makes recall EXACT by pigeonhole
(a pair within Hamming max_hamming must agree on >= 1 whole band), and the
wide bands (15-16 bits -> 2^15+ bucket values) keep the candidate join
sub-quadratic. Moderate-similarity work (Jaccard 0.8-0.9, which lands at
Hamming 8-12 on 64 bits — measured on the sf fixtures) CANNOT be banded
both exactly and cheaply; route it to minhash.py, whose band agreement
probability J^r actually separates at those thresholds. The previous
4-bit-band config (Hamming <= 15 by pigeonhole) admitted ~64% of random
pairs — an O(N^2/16) candidate join; the Manku config admits ~4/2^15.

All JVM: explode shingles -> hash -> n_bits conditional-sum aggregates
(one groupBy with map-side combine) -> assemble the bigint fingerprint.

`portable_hash=True` swaps xxhash64 for the top 60 bits of md5 — an
engine-portable hash (DuckDB computes the identical fingerprint), which is
what lets the driver's SQL oracle check this operator EXACTLY: brute-force
Hamming pairs in DuckDB vs banded candidates here must agree pair-for-pair
(pigeonhole makes that a guarantee, not a data-dependent hope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable

N_BITS_XXHASH = 64
N_BITS_PORTABLE = 60  # 15 hex chars of md5 -> fits a signed BIGINT


def md5_hash60(col) -> Column:
    """Top 60 bits of md5 as a non-negative bigint — identical in DuckDB:
    ('0x' || substr(md5(s), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def with_simhash(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = False,
) -> DataFrame:
    """(doc, shingles, simhash bigint) per non-empty document."""
    n_bits = N_BITS_PORTABLE if portable_hash else N_BITS_XXHASH
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    hash_col = md5_hash60(F.col("s")) if portable_hash else F.xxhash64("s")
    h = sh.select("doc", F.explode("shingles").alias("s")).withColumn(
        "h", hash_col
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(n_bits)
    ]
    agg = h.groupBy("doc").agg(*bit_sums)
    fp = None
    for j in range(n_bits):
        term = F.when(
            F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    sig = agg.select("doc", fp.alias("simhash"))
    return sh.join(sig, "doc")


def simhash_near_dupes(
    docs: DataFrame,
    n: int = 3,
    max_hamming: int = 3,
    min_jaccard: float = 0.5,
    portable_hash: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-identical pairs (doc_a, doc_b, hamming, jaccard).

    Banded candidate join over n_bands = max_hamming + 1 wide bands (recall
    = 1.0 by pigeonhole for pairs within max_hamming) -> Hamming filter
    (bit_count of xor, JVM, pre-distinct so the join output stream is
    pruned inside codegen) -> exact Jaccard verification >= min_jaccard.
    """
    n_bits = N_BITS_PORTABLE if portable_hash else N_BITS_XXHASH
    n_bands = max_hamming + 1
    signed = with_simhash(
        docs, n=n, id_col=id_col, text_col=text_col, portable_hash=portable_hash
    )
    # split n_bits into n_bands contiguous bands, widths as even as possible
    base, extra = divmod(n_bits, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    bands = signed.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", off).bitwiseAND(
                        F.lit((1 << w) - 1)
                    )
                    for off, w in zip(offsets, widths)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
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
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "hamming", round_stable(F.col("jaccard")).alias("jaccard"))
    )
