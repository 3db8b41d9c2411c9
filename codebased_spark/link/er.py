"""Entity-record resolution across catalogs: token blocking + Jaccard.

Mention linking (link/alias.py) attaches TEXT SPANS to a registry;
entity-record resolution merges two REGISTRIES — the step a KG build
hits when fusing entities extracted from independent sources (two
crawls, a crawl + a feed, yesterday's KG + today's). The classic
scale shape (Papadakis et al.'s blocking survey; the same design as
dedup/ngram.py's prefix filter) is:

1. **Block** on shared name tokens so candidate generation is an
   equi-join, never all-pairs.
2. **Cap the blocking key frequency**: a token appearing in more than
   `df_cap` right-side records ('corp', 'inc', a city name) would
   generate df^2 candidate pairs — exactly the quadratic blowup the
   cap exists to cut. Rare tokens (model numbers, distinctive names)
   carry the linkage; this is the documented precision/recall trade
   every production blocker makes, not a shortcut.
3. **Score** candidates with exact set Jaccard as an integer
   (inter, union) pair — no floats in the gate.
4. **Pick best-match per left record** with a deterministic total
   order (ratio desc, right id asc) and flag `is_match` by an integer
   rational threshold (inter * den >= union * num).

Scale: two token explodes (map-only), one df aggregate on the token
vocabulary, one blocking equi-join bounded by the cap, one
candidate-keyed join back to the token sets, one per-left-record
window. Nothing is ever corpus x corpus.

Reference analog: collision-priority dedup in the symbol registry
(SURVEY J2) resolves same-name records by a specificity window; this
is the cross-catalog generalization with explicit blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.dedup.shingles import tokens_col


def _tokset(df: DataFrame, id_col: str, name_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.array_distinct(tokens_col(F.col(name_col))).alias(f"{prefix}_toks"),
    )


def blocked_er(
    a: DataFrame,
    b: DataFrame,
    df_cap: int = 20,
    threshold_num: int = 3,
    threshold_den: int = 10,
    id_col: str = "rec_id",
    name_col: str = "name",
) -> DataFrame:
    """Best B-match per A record via capped token blocking.

    Returns (a_id, b_id, inter, union_sz, is_match) — one row per A
    record with >= 1 candidate; is_match = 1 iff
    inter/union >= threshold_num/threshold_den (integer arithmetic).
    """
    at = _tokset(a, id_col, name_col, "a").localCheckpoint(eager=True)
    bt = _tokset(b, id_col, name_col, "b").localCheckpoint(eager=True)
    b_tok = bt.select("b_id", F.explode("b_toks").alias("tok"))
    # blocking keys: tokens rare on the RIGHT side (df <= cap)
    rare = (
        b_tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("tok")
    )
    b_keyed = b_tok.join(rare, "tok")
    a_tok = at.select("a_id", F.explode("a_toks").alias("tok"))
    cand = a_tok.join(b_keyed, "tok").select("a_id", "b_id").distinct()
    scored = (
        cand.join(at, "a_id")
        .join(bt, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_toks", "b_toks")).alias("inter"),
            (
                F.size("a_toks") + F.size("b_toks")
                - F.size(F.array_intersect("a_toks", "b_toks"))
            ).alias("union_sz"),
        )
    )
    win = Window.partitionBy("a_id").orderBy(
        F.desc(F.col("inter") / F.col("union_sz")), F.asc("b_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select(
            "a_id",
            "b_id",
            "inter",
            "union_sz",
            (
                F.col("inter") * threshold_den >= F.col("union_sz") * threshold_num
            ).cast("int").alias("is_match"),
        )
    )
