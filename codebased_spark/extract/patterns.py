"""Typed pattern extraction — the second extractor family (E14).

The reference runs several per-language extractor families over the same
document (python/javascript/typescript parsers, SURVEY.md §2.2); the web
analog of a "second typed family" beside the gazetteer automaton is
closed-class pattern entities: emails, ISO dates, money amounts — typed
spans recognized by grammar, not by dictionary. All JVM
(`regexp_extract_all`), zero Python, one pass per pattern.

`extract/registry.py` provides the per-kind dispatch (S5) that routes a
corpus through any subset of the registered families and unions the typed
mention rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern name -> (regex, entity_type)
PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "Email"),
    "iso_date": (r"\b\d{4}-\d{2}-\d{2}\b", "Date"),
    "money": (r"\$\d+(?:\.\d{2})?", "Money"),
}


def pattern_mentions_col(text: Column, names: tuple[str, ...] | None = None) -> Column:
    """array<struct<surface,entity_type>> of all typed pattern matches."""
    arrays = []
    for name in names or tuple(PATTERNS):
        regex, etype = PATTERNS[name]
        arrays.append(
            F.transform(
                F.regexp_extract_all(text, F.lit(regex), 0),
                lambda s: F.struct(
                    s.alias("surface"), F.lit(etype).alias("entity_type")
                ),
            )
        )
    return F.concat(*arrays) if len(arrays) > 1 else arrays[0]


def extract_pattern_mentions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    names: tuple[str, ...] | None = None,
) -> DataFrame:
    """(id, surface, entity_type) — one row per typed pattern match."""
    return df.select(
        F.col(id_col),
        F.explode(pattern_mentions_col(F.col(text_col), names)).alias("m"),
    ).select(id_col, F.col("m.surface").alias("surface"), F.col("m.entity_type").alias("entity_type"))


def redact_patterns(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    names: tuple[str, ...] | None = None,
) -> DataFrame:
    """PII redaction over the typed pattern families: every match of each
    registered pattern is replaced with its `[TYPE]` token, with per-kind
    match counts for audit — the training-data scrub step that pairs with
    extraction (the same regexes decide both what is *extracted* as an
    entity and what must be *removed* before text ships to a model).

    Output: (id, redacted, n_<name> per pattern). Counts are taken on the
    ORIGINAL text per kind (order-independent); replacements run in
    registration order, all as JVM `regexp_replace` passes — zero Python.
    """
    use = names or tuple(PATTERNS)
    out = F.col(text_col)
    counts = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(PATTERNS[name][0]), 0)
        ).alias(f"n_{name}")
        for name in use
    ]
    for name in use:
        regex, etype = PATTERNS[name]
        out = F.regexp_replace(out, regex, f"[{etype.upper()}]")
    return df.select(F.col(id_col), out.alias("redacted"), *counts)
