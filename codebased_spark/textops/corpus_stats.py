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


def trigram_diversity(
    docs: DataFrame,
    p: int = 8,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source lexical-diversity census: exact volume counters plus a
    fixed-size HLL sketch of the DISTINCT word-trigram count.

    The distinct-n-gram/total-n-gram ratio is the standard corpus
    diversity diagnostic (low ratio = templated/boilerplate-heavy
    source; a training-mix builder weighs sources by it) — but an EXACT
    distinct-trigram count per source is a corpus-sized shuffle on a
    near-unique key, the single most expensive aggregate one can ask of
    a 100-TB corpus. This computes the exact cheap parts (n_docs,
    n_tokens, n_trigram occurrences: all map-side combinable per
    source) and sketches the expensive part with per-group HyperLogLog
    (sketches.py machinery): the shuffle carries at most
    |sources| * 2^p register rows regardless of corpus size.

    Determinism contract (sketches.py): md5_hash60 registers, so the
    DuckDB oracle recomputes identical state; emitted sketch columns
    are the exact integers (n_filled, harm_num with empty registers
    counting 2^RMAX, RMAX = 60 - p + 1); the float cardinality estimate
    stays driver-side.
    """
    from codebased_spark.dedup.shingles import ngrams_col, tokens_col
    from codebased_spark.dedup.simhash import md5_hash60

    m = 1 << p
    rem_bits = 60 - p
    rmax = rem_bits + 1
    toks = tokens_col(F.col(text_col))
    grams = docs.select(
        F.col(source_col).alias("source"),
        F.explode(ngrams_col(toks, 3)).alias("g"),
    )
    h = md5_hash60(F.col("g"))
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(rmax)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(w)) + 1
    )
    regs = (
        grams.select("source", (h % m).alias("register"), rank.alias("r"))
        .groupBy("source", "register")
        .agg(F.max("r").alias("max_rank"), F.count(F.lit(1)).alias("cnt"))
    )
    sketch = regs.groupBy("source").agg(
        F.sum("cnt").alias("n_trigrams"),
        F.count(F.lit(1)).alias("n_filled"),
        # SQL form: pyspark's shiftleft only takes a literal int numBits
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - max_rank)")
        ).alias("_filled_sum"),
    )
    vol = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )
    empty = (F.lit(m) - F.col("n_filled")).cast("long") * F.shiftleft(
        F.lit(1).cast("long"), rmax
    )
    return vol.join(sketch, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        F.coalesce("n_filled", F.lit(0)).alias("n_filled"),
        F.coalesce(
            F.col("_filled_sum") + empty,
            F.lit(m).cast("long") * F.shiftleft(F.lit(1).cast("long"), rmax),
        ).alias("harm_num"),
    )
