"""Asymmetric shingle containment join (Broder, SEQUENCES 1997).

Jaccard resemblance misses the commonest real-web duplication shape:
a SMALL document living inside a BIG one — syndicated quotes, article
bodies wrapped in boilerplate-heavy portals, chunked excerpts re-posted
whole. A 40-token quote inside a 4000-token page has Jaccard ~0.01 but
containment 1.0. Training-data pipelines drop (or down-weight) contained
docs so the big host page doesn't smuggle the duplicate text past the
resemblance-based dedup passes (dedup/ngram.py, dedup/minhash.py).

containment(A -> B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|

Exact and scale-shaped like ngram.py's counting join: explode distinct
shingles (pure JVM, map-side), one self-join on the shingle keyed by the
inverted index, one (inner, outer) count = |intersection|, then a narrow
size join. Every shuffled row is a pair of longs. The one-sided length
filter |B| >= t*|A| is applied at verify (containment needs no lower
bound on the big side, unlike Jaccard's symmetric filter). For corpora
where stop-shingles blow up sum(df^2), the same prefix-filter split as
ngram_jaccard_pairs_prefix applies — for containment >= t the probing
prefix of A is its |A| - ceil(t*|A|) + 1 rarest shingles (Bayardo et
al.'s bound, one-sided).

Reference analog: the reference dedups identical files by content hash
only (SURVEY S6/S8); containment is the web-corpus generalization this
engine adds for the 100 TB training-data use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import with_shingles
from codebased_spark.util import round_stable


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ordered pairs (doc_inner, doc_outer, containment) with
    containment(inner -> outer) >= threshold, inner != outer.

    The scale path: ONE-SIDED prefix filter. For containment >= t the
    inner doc can afford at most |A| - ceil(t*|A|) misses, so its first
    |A| - ceil(t*|A|) + 1 shingles in the global rare-first order must
    hit the outer doc somewhere — candidates join inner PREFIXES against
    the full inverted index (cost sum(df_prefix * df), vs the counting
    join's sum(df^2) which stop-shingles blow up: 13.9s -> this path at
    sf0.1). The lossless one-sided length filter |B| >= ceil(t*|A|) is
    pushed into the join condition. Every candidate verifies over the
    full shingle arrays, so the output equals brute force exactly; the
    counting-join twin below stays as the pytest cross-check.
    """
    _EPS = 1e-9
    sh = (
        with_shingles(docs, text_col=text_col, n=n)
        .select(F.col(id_col).alias("doc"), "shingles")
        .where(F.size("shingles") > 0)
    )
    exploded = sh.select("doc", F.explode("shingles").alias("sh"))
    df_counts = exploded.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        exploded.join(df_counts, "sh")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("ordered"))
    )
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
    full = exploded.join(
        sh.select("doc", F.size("shingles").alias("sz")), "doc"
    )
    cand = (
        prefix.alias("a")
        .join(
            full.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") != F.col("b.doc"))
            & (
                F.col("b.sz")
                >= F.ceil(F.lit(threshold) * F.col("a.sz") - F.lit(_EPS))
            ),
        )
        .select(
            F.col("a.doc").alias("doc_inner"), F.col("b.doc").alias("doc_outer")
        )
        .distinct()
    )
    sh_in = sh.select(F.col("doc").alias("doc_inner"), F.col("shingles").alias("s_in"))
    sh_out = sh.select(F.col("doc").alias("doc_outer"), F.col("shingles").alias("s_out"))
    return (
        cand.join(sh_in, "doc_inner")
        .join(sh_out, "doc_outer")
        .withColumn(
            "containment",
            F.size(F.array_intersect("s_in", "s_out"))
            / F.size("s_in").cast("double"),
        )
        .where(F.col("containment") >= threshold)
        .select(
            "doc_inner",
            "doc_outer",
            round_stable(F.col("containment")).alias("containment"),
        )
    )


def containment_pairs_counting(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Counting-join twin (exact, no prefix filter) — the pytest
    cross-check for containment_pairs, same contract. Cost sum(df^2):
    fine on fixtures, stop-shingle-bound at corpus scale."""
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
        .where(F.col("a.doc") != F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_inner"), F.col("b.doc").alias("doc_outer")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc").alias("doc_inner"), F.col("sz").alias("sz_in")),
            "doc_inner",
        )
        .withColumn(
            "containment", F.col("inter") / F.col("sz_in").cast("double")
        )
        .where(F.col("containment") >= threshold)
        .select(
            "doc_inner",
            "doc_outer",
            round_stable(F.col("containment")).alias("containment"),
        )
    )
