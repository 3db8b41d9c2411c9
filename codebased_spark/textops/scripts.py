"""Unicode script census — the routing signal UNDER language ID.

Script detection is the first gate of every multilingual corpus pipeline
(CCNet/mC4 bucket by script before n-gram language ID runs, because a
Cyrillic page can never be English and a Han page never needs a Latin
stopword table). It is also the cheap mixed-script spam signal: pages
interleaving Latin + Cyrillic lookalikes are the classic homoglyph
phishing/spam shape.

All map-only whole-stage codegen: per-script character counts via one
regexp_replace + length subtraction per script (no arrays, no UDFs, no
shuffle). Spark's Java regex spells scripts \\p{IsCyrillic}; the DuckDB
oracle's RE2 spells the same property \\p{Cyrillic} — the match sets
for these BMP scripts are identical.

Dominant-script tie-break is a fixed precedence CASE
(latin > cyrillic > han > arabic), stated identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, java_pattern, re2_pattern) — BMP scripts where the Java and RE2
# property match sets coincide
SCRIPTS = [
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("arabic", "\\p{IsArabic}", "\\p{Arabic}"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, pattern, ""))


def script_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_latin, n_cyrillic, n_han, n_arabic, dominant_script,
    is_multiscript) — one codegen projection, no shuffle."""
    t = F.col(text_col)
    counts = {name: _count(t, java) for name, java, _ in SCRIPTS}
    lat, cyr, han, ara = (counts[n] for n in ("latin", "cyrillic", "han", "arabic"))
    dominant = (
        F.when((lat >= cyr) & (lat >= han) & (lat >= ara), "latin")
        .when((cyr >= han) & (cyr >= ara), "cyrillic")
        .when(han >= ara, "han")
        .otherwise("arabic")
    )
    n_scripts = sum(
        F.when(counts[name] > 0, 1).otherwise(0) for name, _, _ in SCRIPTS
    )
    return df.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in SCRIPTS],
        dominant.alias("dominant_script"),
        (n_scripts >= 2).alias("is_multiscript"),
    )


def script_census_sql(source_cte: str) -> str:
    """DuckDB mirror over a CTE exposing (doc_id, text)."""
    cnt = {
        name: f"(len(text) - len(regexp_replace(text, '{re2}', '', 'g')))"
        for name, _, re2 in SCRIPTS
    }
    lat, cyr, han, ara = (cnt[n] for n in ("latin", "cyrillic", "han", "arabic"))
    n_scripts = " + ".join(
        f"(CASE WHEN {cnt[name]} > 0 THEN 1 ELSE 0 END)" for name, _, _ in SCRIPTS
    )
    cols = ",\n           ".join(
        f"{cnt[name]} AS n_{name}" for name, _, _ in SCRIPTS
    )
    return f"""
    WITH src AS ({source_cte})
    SELECT doc_id,
           {cols},
           CASE WHEN {lat} >= {cyr} AND {lat} >= {han} AND {lat} >= {ara}
                  THEN 'latin'
                WHEN {cyr} >= {han} AND {cyr} >= {ara} THEN 'cyrillic'
                WHEN {han} >= {ara} THEN 'han'
                ELSE 'arabic' END AS dominant_script,
           ({n_scripts}) >= 2 AS is_multiscript
    FROM src
    """
