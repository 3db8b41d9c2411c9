"""Exact n-gram Jaccard similarity join with prefix filtering (AllPairs).

The naive all-pairs O(N^2) comparison is the oracle, not the algorithm. The
scalable exact method is the inverted-index join with the *prefix filter*
(Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07; same
family as PPJoin): for Jaccard >= t, two sets of sizes |A|,|B| must share at
least one element among the first p = |X| - ceil(t*|X|) + 1 elements of each
set when both are sorted by a global canonical order (document frequency
ascending, then value). Joining only on prefix elements keeps the candidate
blow-up proportional to rare shingles, not to stop-shingles.

Every candidate is then verified with the exact intersection over the full
shingle sets, so the output equals brute force — this is an EXACT operator
with a pruned search space, not an approximation.

Shuffle budget: one groupBy for document frequencies (shingle vocabulary,
<< corpus), one join on prefix shingles, one broadcast-join back to the
full shingle arrays for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold: (doc_a, doc_b, jaccard).

    Inverted-index counting join: explode distinct shingles, self-join on
    the shingle, count co-occurrences per pair = |intersection|, join the
    two set sizes (narrow), filter. Exact, and every shuffled row is a
    pair of longs — no shingle arrays move (the array-verification form
    shuffled ~10x the bytes). Cost is sum over shingles of df^2; for
    corpora where stop-shingles make that explode, use
    ngram_jaccard_pairs_prefix (prefix filter caps the join at rare
    shingles at the price of re-shuffling the full sets to verify).

    doc_a < doc_b; jaccard rounded to 4 decimals.
    """
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    exploded = sh.select("doc", F.explode("shingles").alias("sh"))
    sizes = sh.select("doc", F.size("shingles").alias("sz"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"), "sh")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", round_stable(F.col("jaccard")).alias("jaccard"))
    )


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Prefix-filtered variant (AllPairs candidates + array verification).

    Wins when stop-shingles make the counting join's df^2 blow up; the
    candidate join touches only each doc's rare-shingle prefix.
    """
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )

    # global canonical order: df asc, shingle asc — rare shingles first.
    # The ordered prefix is built with ONE shuffle (groupBy doc +
    # array_sort over (df, sh) structs + slice), not a window sort plus a
    # sizes join — at web scale the per-doc window sort was the extra
    # exchange that dominated this stage.
    exploded = sh.select("doc", F.explode("shingles").alias("sh"))
    df_counts = exploded.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        exploded.join(df_counts, "sh")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("ordered"))
    )
    # prefix length p = sz - ceil(t*sz) + 1. The epsilon keeps the bound
    # lossless at exact-threshold boundaries: for thresholds whose double
    # repr exceeds the decimal (e.g. 0.8 -> 0.8000000000000000444),
    # t*sz at an integer boundary lands just above it and a bare ceil()
    # rounds one too high — shortening the prefix below the lossless
    # minimum and silently dropping pairs with Jaccard exactly t.
    _EPS = 1e-9
    prefix_len = (
        F.size("ordered")
        - F.ceil(F.lit(threshold) * F.size("ordered") - F.lit(_EPS))
        + 1
    ).cast("int")
    prefix = ranked.select(
        "doc",
        F.size("ordered").alias("sz"),
        F.explode(
            F.transform(
                F.slice("ordered", F.lit(1), prefix_len), lambda s: s["sh"]
            )
        ).alias("sh"),
    )

    # length filter (lossless): J(A,B) >= t implies t*|A| <= |B| <= |A|/t,
    # pruned INSIDE the join condition so over/under-sized pairs never
    # reach the distinct shuffle or the array verification (same epsilon
    # guard as prefix_len for exact-boundary sizes)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.col("b.sz") >= F.ceil(F.lit(threshold) * F.col("a.sz") - F.lit(_EPS)))
            & (F.col("a.sz") >= F.ceil(F.lit(threshold) * F.col("b.sz") - F.lit(_EPS))),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    # exact verification over the full shingle sets
    sh_a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
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
    return verified


def ngram_jaccard_bruteforce(
    docs: DataFrame, n: int = 3, threshold: float = 0.6,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """O(N^2) reference implementation (tests compare against this)."""
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", round_stable(F.col("jaccard")).alias("jaccard"))
    )
