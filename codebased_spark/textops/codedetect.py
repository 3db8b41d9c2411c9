"""Code-content profiling: how much of a page is source code.

A training-data pipeline routes code and prose differently (different
tokenizers, different quality filters, different mixture weights), so
the curation table needs a per-document code profile BEFORE any routing
decision. On webtext the dominant, reliable signal is explicit code
markup: <pre> and <code> blocks. This module counts them and their
character mass and derives an integer-arithmetic code-heaviness flag —
no floats, so the result is value-checkable cross-engine.

Scale shape: pure JVM regexp/length expressions inside whole-stage
codegen — one projection, no shuffle, no UDF.

Reference analog: inverted — the reference parses ONLY code and treats
prose as comments (parsers/*); a web corpus is prose that embeds code,
so the detector marks the embedded-code mass for routers downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRE_RE = "(?is)<pre\\b[^>]*>(.*?)</pre\\s*>"
_CODE_RE = "(?is)<code\\b[^>]*>(.*?)</code\\s*>"


def code_profile(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    text_col: str | None = "text",
) -> DataFrame:
    """(url, n_pre, n_code_inline, code_chars, text_chars, code_heavy).

    code_chars = summed length of <pre> block contents plus <code>
    contents OUTSIDE <pre> (pre is stripped first so nested
    <pre><code>..</code></pre> is not double-counted). text_chars =
    length of `text_col` (0 when absent). code_heavy = 1 iff
    code_chars * 5 > text_chars — ">20% code mass" stated in integers.
    """
    html = F.col(html_col).cast("string")
    pre_blocks = F.regexp_extract_all(html, F.lit(_PRE_RE), 1)
    sans_pre = F.regexp_replace(html, _PRE_RE, " ")
    code_blocks = F.regexp_extract_all(sans_pre, F.lit(_CODE_RE), 1)
    blk_len = lambda arr: F.coalesce(  # noqa: E731 — local shaping helper
        F.aggregate(arr, F.lit(0), lambda acc, s: acc + F.length(s)), F.lit(0)
    )
    code_chars = (blk_len(pre_blocks) + blk_len(code_blocks)).alias("code_chars")
    text_chars = (
        F.coalesce(F.length(F.col(text_col)), F.lit(0))
        if text_col is not None
        else F.lit(0)
    ).alias("text_chars")
    out = pages.select(
        F.col(url_col).alias("url"),
        F.size(pre_blocks).alias("n_pre"),
        F.size(code_blocks).alias("n_code_inline"),
        code_chars,
        text_chars,
    )
    return out.withColumn(
        "code_heavy",
        (F.col("code_chars") * 5 > F.col("text_chars")).cast("int"),
    )


_FENCE_RE = r"(?s)```([a-z]*)\n(.*?)```"


def code_fences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fence_idx, lang_tag, n_lines, n_chars) per markdown code
    fence — the EXTRACTION stage behind the code-mass profile above: a
    code-data miner lifts fenced blocks out of prose (with their
    declared language tag, '' -> 'plain') and routes them to the code
    pipeline. Two regexp_extract_all passes over the SAME pattern
    (group 1 = tag, group 2 = body) align positionally, zipped and
    exploded — the tx_qa_pairs idiom; all JVM, map-only."""
    tags = F.regexp_extract_all(F.col(text_col), F.lit(_FENCE_RE), F.lit(1))
    bodies = F.regexp_extract_all(F.col(text_col), F.lit(_FENCE_RE), F.lit(2))
    z = F.arrays_zip(tags.alias("t"), bodies.alias("b"))
    return (
        docs.select(F.col(id_col), F.posexplode(z).alias("pos", "f"))
        .where(F.col("f.b").isNotNull())
        .select(
            id_col,
            (F.col("pos") + 1).alias("fence_idx"),
            F.when(F.col("f.t") == "", F.lit("plain"))
            .otherwise(F.col("f.t"))
            .alias("lang_tag"),
            (F.size(F.split(F.col("f.b"), "\n")) - 1).alias("n_lines"),
            F.length("f.b").alias("n_chars"),
        )
    )
