"""Per-document quality scoring — pure column expressions (codegen).

The classic training-data quality heuristics (Gopher/C4-style filters):
token count, mean token length, stopword ratio, distinct-token ratio,
alpha ratio. Every metric is a JVM expression over split(text); a 100 TB
corpus is scored map-side with zero shuffle, and the score predicate pushes
down to the scan when used as a filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable

# words whose presence marks fluent English filler (tiny broadcast-free
# literal list; real pipelines plug a per-language table here)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def _toks(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def doc_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, distinct_ratio, stopword_ratio,
    mean_tok_len, quality_score) — all rounded to 4 decimals.

    `keep_cols` passes extra input columns through (e.g. lang for the
    per-language bucketing downstream) so callers never need a
    corpus-sized self-join to recover a column this select dropped."""
    toks = _toks(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    distinct_ratio = round_stable(n_distinct / n_tokens.cast("double"))
    stopword_ratio = round_stable(n_stop / n_tokens.cast("double"))
    mean_tok_len = round_stable(tok_chars / n_tokens.cast("double"))
    # composite score: fluency needs stopwords but not only stopwords, a
    # diverse vocabulary, and word lengths in a natural range
    score = round_stable(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.25
        + F.least(F.lit(1.0), stopword_ratio * 5) * 0.25
        + distinct_ratio * 0.25
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.25).otherwise(0.0)
    )
    return docs.where(F.size(toks) > 0).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality_score"),
    )
