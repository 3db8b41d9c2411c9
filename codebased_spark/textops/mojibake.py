"""Mojibake (UTF-8-as-Latin-1 double encoding) detection and repair.

Crawled corpora are full of text that was UTF-8, got decoded as
Latin-1/cp1252 somewhere in the pipeline, and re-encoded — leaving the
telltale lead bytes as characters: 'Ã©' for 'é', 'â€™' for a curly
apostrophe, 'Ã¼' for 'ü'. A training-data pipeline needs to (a) flag
affected documents and (b) repair them before tokenization (the damage
multiplies token counts and poisons dedup shingles).

Detection is a pure-codegen regexp count of the two dominant marker
families (U+00C3 'Ã' followed by a Latin-1 continuation character, and
the U+00E2 U+20AC 'â€' cp1252 punctuation family) — portable to any
engine with regex support.

Repair is the exact inverse transform, entirely JVM-side:
``decode(encode(text, 'ISO-8859-1'), 'UTF-8')`` — re-encode the
characters back to the original bytes, re-decode as UTF-8. Applied only
to detected rows; a repair that fails to decode (genuine Latin-1 text
that merely looks suspicious) yields garbage on real data, so production
use gates on marker density — here the detector requires >= 2 markers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 'Ã' + Latin-1 supplement char (the re-decoded UTF-8 lead/continuation
# pair), or the cp1252 'â€x' punctuation triple. \x{..} class syntax is
# shared by Java regex (Spark) and RE2 (DuckDB); \uXXXX is not (RE2
# rejects it).
# three families: 'Ã'+continuation (2-byte chars), cp1252-shaped 'â€x'
# (the famous â€™), and latin-1-shaped 'â'+C1-control (same bytes when
# the bad decode was ISO-8859-1 instead of cp1252)
MOJIBAKE_PATTERN = 'Ã[\\x{80}-\\x{ff}]|â€.|â[\\x{80}-\\x{9f}].'


def mojibake_markers(col: Column) -> Column:
    """Count of mojibake marker sequences in `col` (exact integer)."""
    return F.regexp_count(col, F.lit(MOJIBAKE_PATTERN))


def detect_mojibake(
    docs: DataFrame,
    text_col: str = "text",
    min_markers: int = 2,
) -> DataFrame:
    """(doc_id, n_markers, is_mojibake) per document — map-only, no
    shuffle; the filter predicate pushes into the scan's codegen stage."""
    n = mojibake_markers(F.col(text_col))
    return docs.select(
        "doc_id",
        n.alias("n_markers"),
        (n >= min_markers).alias("is_mojibake"),
    )


def repair_mojibake(
    docs: DataFrame,
    text_col: str = "text",
    min_markers: int = 2,
) -> DataFrame:
    """Adds `text_repaired`: the double-decoding inverted for detected
    rows, the original text otherwise. Both charset hops are Spark
    built-ins (whole-stage codegen, zero Python)."""
    n = mojibake_markers(F.col(text_col))
    fixed = F.decode(F.encode(F.col(text_col), "ISO-8859-1"), "UTF-8")
    return docs.withColumn(
        "text_repaired",
        F.when(n >= min_markers, fixed).otherwise(F.col(text_col)),
    )
