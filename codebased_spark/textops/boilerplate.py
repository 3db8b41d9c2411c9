"""Per-host boilerplate n-gram detection — the template-stripping signal.

Web corpora are full of host-level templates (cookie banners, nav bars,
footers) that survive per-document quality filters because every copy is
locally fluent. The standard curation counter (CCNet's per-shard
paragraph-hash dedup, RefinedWeb §3.2's line-wise filtering) is a
DOCUMENT-FREQUENCY test scoped to the host: a text unit that appears in
many documents of the same host is template, not content.

Our documents are single-line word streams, so the text unit is the
overlapping word n-gram (the same unit the dedup family uses); a gram is
boilerplate when its per-host document frequency reaches `min_df`. The
output is the per-document decision table a filter pipeline consumes:
how much of each doc is template, and whether it crosses the drop line.

Reference analog: SURVEY.md E7/A7's per-document scalar metrics, but the
statistic is corpus-derived rather than per-doc — the same two-pass shape
as textops/tfidf.py (corpus aggregate joined back to the fact table).

Scale shape: grams are built MAP-SIDE (one `transform` over an index
sequence — no UDF); shuffle 1 aggregates (host, gram) -> df with map-side
partial aggregation; the boilerplate set (df >= min_df) is then joined
back to the gram occurrences on the SAME (host, gram) key, so AQE reuses
the exchange; shuffle 2 is the doc_id-keyed reduce. Nothing is
corpus-global — every key is scoped to one host, so skew is bounded by
the largest host and salting composes (link/skew.py) if one host
dominates. The boilerplate set is NOT broadcast by default: at web scale
a big host's template vocabulary alone can exceed driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable

BOILER_MAX_FRAC = 0.2  # drop line: docs that are >=20% template


def _grams(words_col: str, n: int):
    """Overlapping word n-grams, map-side (empty when the doc has < n
    words) — the textops/repetition.py builder, same contract."""
    w = F.col(words_col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def boilerplate_metrics(
    docs: DataFrame,
    n: int = 4,
    min_df: int = 5,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    max_frac: float = BOILER_MAX_FRAC,
) -> DataFrame:
    """(doc_id, n_grams, n_boiler, boiler_frac, is_templated) per doc.

    n_boiler counts gram OCCURRENCES (with multiplicity) whose gram has
    per-host document frequency >= min_df; boiler_frac = n_boiler/n_grams
    (ratio of integers — bit-identical across engines) rounded to 4
    decimals; is_templated = boiler_frac >= max_frac. Docs with fewer
    than n words have no grams and are dropped — a length filter runs
    before this one in any real pipeline (textops/filters.py).
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    occ = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(host_col).alias("host"),
            words.alias("words"),
        )
        .select("doc_id", "host", F.explode(_grams("words", n)).alias("gram"))
    )
    boiler = (
        occ.groupBy("host", "gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= min_df)
        .select("host", "gram")
    )
    per_doc = occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    boiler_per_doc = (
        occ.join(boiler, ["host", "gram"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    frac = F.col("n_boiler") / F.col("n_grams")
    return (
        per_doc.join(boiler_per_doc, "doc_id", "left")
        .na.fill({"n_boiler": 0})
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            round_stable(frac, 4).alias("boiler_frac"),
            (frac >= max_frac).cast("int").alias("is_templated"),
        )
    )
