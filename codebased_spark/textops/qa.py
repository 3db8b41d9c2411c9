"""FAQ question/answer pair mining — instruction-tuning data from web text.

Production SFT pipelines mine natural Q/A pairs from FAQ pages, help
centers, and StackExchange-style markup (public recipe: Dolma / OpenAssistant
data notes); the extractor is the same closed-class pattern family as
`extract/patterns.py` (reference E14 analog, SURVEY.md §2.2: several typed
extractor families over the same document), retargeted from entity spans to
question/answer span PAIRS, which must be re-aligned positionally after
extraction.

Shape at 100 TB: two `regexp_extract_all` passes + `arrays_zip` +
`posexplode` — all JVM whole-stage codegen, zero Python, map-only (no
shuffle until the caller aggregates). Per-doc output is bounded by the
number of "Q:" markers, so the explode fans out linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a question runs from "Q: " to the first '?'; its answer from the
# following "A: " to the first '.' — the Q/A marker grammar FAQ markup
# renders to once tags are stripped
Q_PATTERN = r"Q: ([^?]*\?)"
A_PATTERN = r"A: ([^.]*\.)"


def qa_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pair_idx, question, answer, a_chars) — positionally aligned
    Q/A pairs per document. Docs with unequal Q/A marker counts keep only
    the aligned prefix (arrays_zip pads with NULL; the filter drops the
    orphans) — a truncated FAQ page yields its complete pairs, never a
    misaligned one."""
    qs = F.regexp_extract_all(F.col(text_col), F.lit(Q_PATTERN), F.lit(1))
    ans = F.regexp_extract_all(F.col(text_col), F.lit(A_PATTERN), F.lit(1))
    zipped = F.arrays_zip(qs.alias("q"), ans.alias("a"))
    return (
        docs.select(F.col(id_col), F.posexplode(zipped).alias("pos", "pair"))
        .where(F.col("pair.q").isNotNull() & F.col("pair.a").isNotNull())
        .select(
            id_col,
            (F.col("pos") + 1).alias("pair_idx"),
            F.col("pair.q").alias("question"),
            F.col("pair.a").alias("answer"),
            F.length("pair.a").alias("a_chars"),
        )
    )
