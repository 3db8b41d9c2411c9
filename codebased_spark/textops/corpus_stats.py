"""Corpus-derived token statistics — the learned-stopword filter.

textops/quality.py scores docs against a FIXED stopword list; real
curation pipelines (CCNet §4.2's LM-filtering setup, C4's heuristics
tuning) derive the high-frequency token set from the corpus itself so
the filter tracks the corpus's actual language mix. This module computes
that learned head set (top-k tokens by corpus frequency, deterministic
tie-break) and scores every document by the fraction of its tokens that
fall in it — too LOW a fraction means lexicon-less noise (menus, code,
ids), too HIGH means stopword soup; both tails get dropped.

Scale shape: one corpus-wide (word) aggregation with map-side combine —
the result is vocabulary-sized, orders of magnitude smaller than the
corpus; the top-k of it is k rows, broadcast back to the token stream so
the fact table never shuffles for the membership test; then one
doc-keyed reduce. The total order (count desc, word asc) makes the k-th
boundary deterministic, so the statistic is cross-engine exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable


def build_postings(
    docs: DataFrame,
    champions: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index construction: per term, document frequency, total
    term frequency, and a bounded champion list (the first `champions`
    doc ids in ascending order, comma-joined) — the term-dictionary +
    champion-list structure an IR engine materializes over the corpus
    (Manning et al., IIR §7.1.3; web-scale engines cap posting prefixes
    exactly like this so no single term's row is unbounded).

    Scale shape: one (term, doc) distinct + aggregation for df/tf (term
    keys — map-side combine absorbs the Zipf head), one window partitioned
    by term for the champion cut, then a term-keyed reduce whose
    collect_list is BOUNDED at `champions` rows by the preceding filter —
    the only collect in the repo's agg paths, and it is provably capped.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    win = Window.partitionBy("term").orderBy(F.asc("doc_id"))
    ranked = per_doc.withColumn("rn", F.row_number().over(win))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= champions, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("champions"),
    )


def learned_stopword_fraction(
    docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_stop, stop_frac) per doc: n_stop counts token
    occurrences belonging to the corpus's top-k tokens; stop_frac is the
    integer ratio rounded to 4 decimals (bit-identical across engines).
    Docs with zero words are dropped (a length filter precedes this one)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.col("word") != "")
    top = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(k)
        .select("word")
    )
    n_words = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    n_stop = (
        toks.join(F.broadcast(top), "word")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_stop"))
    )
    return (
        n_words.join(n_stop, "doc_id", "left")
        .na.fill({"n_stop": 0})
        .select(
            "doc_id",
            "n_words",
            "n_stop",
            round_stable(F.col("n_stop") / F.col("n_words"), 4).alias("stop_frac"),
        )
    )
