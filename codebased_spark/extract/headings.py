"""Heading outline — the document section tree behind section-aware
chunking.

Token-window chunking (textops/chunk.py) splits mid-thought; production
RAG/pretraining pipelines prefer SECTION-aware chunks, which need the
heading outline: every h1-h6 with its position and its parent heading
(nearest PRECEDING heading of a strictly smaller level — the HTML5
outline rule for flat heading sequences).

Plan shape: one regex pass lifts (level, pos, title) rows map-side
(case/quote/attr-order-tolerant per house rules); the parent resolution
is a per-doc window with SIX conditional running-max columns (last seen
position of each level), and parent = greatest among levels < own. The
window is keyed by doc (bounded by per-doc heading counts), never
global; titles ride along, html never shuffles.

Reference analog: E17 nesting metrics (extract/metadata.py) count
structure; this materializes it as rows a chunker can join on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_H_RE = r"(?is)<h([1-6])[^>]*>(.*?)</h\1\s*>"


def heading_outline(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html_text",
) -> DataFrame:
    """(id, heading_idx, level, title, parent_idx) per heading;
    parent_idx is NULL for top-of-scope headings. Titles are
    tag-stripped and whitespace-collapsed."""
    levels = F.regexp_extract_all(F.col(html_col), F.lit(_H_RE), F.lit(1))
    titles = F.regexp_extract_all(F.col(html_col), F.lit(_H_RE), F.lit(2))
    z = F.arrays_zip(levels.alias("l"), titles.alias("t"))
    h = (
        docs.select(F.col(id_col), F.posexplode(z).alias("pos", "h"))
        .select(
            id_col,
            (F.col("pos") + 1).alias("heading_idx"),
            F.col("h.l").cast("int").alias("level"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("h.t"), "<[^>]*>", " "),
                    "\\s+", " ",
                )
            ).alias("title"),
        )
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("heading_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasts = [
        F.max(F.when(F.col("level") == lv, F.col("heading_idx"))).over(w)
        for lv in range(1, 7)
    ]
    # parent = max(last position of any STRICTLY smaller level); h6 can
    # have parents of level 1-5, h1 none -> every when() is NULL -> NULL
    h = h.withColumn(
        "parent_idx",
        F.greatest(
            *[
                F.when(F.col("level") > lv, lasts[lv - 1])
                for lv in range(1, 6)
            ]
        ),
    )
    return h.select(id_col, "heading_idx", "level", "title", "parent_idx")
