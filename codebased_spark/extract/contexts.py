"""Mention-context windows: NER/EL training examples from the corpus.

Entity-linking models train on (left context, surface, right context)
windows around known mentions; the gazetteer pipeline that emits
mentions (extract/mentions.py, reference javascript.py dictionary scan)
is also the natural labeler. This stage cuts fixed-width character
windows around the FIRST occurrence of each gazetteer surface per
document — the distant-supervision example extractor for a linker.

Scale shape: broadcast-nested-loop join of the corpus against the tiny
gazetteer dimension with an `instr > 0` predicate, then pure codegen
string slicing — no Python, no shuffle at all (map-only), so it streams
at scan speed over 100 TB. First-occurrence is SUBSTRING semantics
(instr), deliberately: it is exactly restatable in ANSI SQL (strpos) so
the oracle gates the window arithmetic byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def offset_windows(
    rows: DataFrame,
    text_col: str = "text",
    start_col: str = "mstart",
    end_col: str = "mend",
    width: int = 40,
) -> DataFrame:
    """Context windows from KNOWN mention offsets (the pipeline's flat
    mention rows carry 0-based [mstart, mend) spans), as opposed to
    mention_windows' first-occurrence instr scan. Pure codegen substr
    arithmetic — map-only, adds `left_ctx` / `right_ctx` columns."""
    start1 = F.col(start_col) + 1  # 1-based first char of the mention
    left_start = F.greatest(F.lit(1), start1 - F.lit(width))
    return rows.withColumn(
        "left_ctx", F.col(text_col).substr(left_start, start1 - left_start)
    ).withColumn(
        "right_ctx", F.col(text_col).substr(F.col(end_col) + 1, F.lit(width))
    )


def mention_windows(
    docs: DataFrame,
    gaz: DataFrame,
    text_col: str = "text",
    width: int = 40,
) -> DataFrame:
    """(doc, surface) first-occurrence context windows of `width` chars.

    gaz must carry (surface_form, canonical_id, entity_type); output is
    one row per (doc, surface present in doc) with 1-based `pos`,
    `left_ctx` (up to `width` chars ending just before the mention) and
    `right_ctx` (up to `width` chars starting just after it).
    """
    g = F.broadcast(gaz)
    pos = F.instr(F.col(text_col), F.col("surface_form"))
    j = docs.join(g, pos > 0)
    p = F.instr(F.col(text_col), F.col("surface_form"))
    left_start = F.greatest(F.lit(1), p - F.lit(width))
    return j.select(
        "doc_id",
        "surface_form",
        "canonical_id",
        "entity_type",
        p.alias("pos"),
        F.col(text_col).substr(left_start, p - left_start).alias("left_ctx"),
        F.col(text_col)
        .substr(p + F.length("surface_form"), F.lit(width))
        .alias("right_ctx"),
    )
