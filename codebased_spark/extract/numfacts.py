"""Numeric-fact extraction — typed (entity, attribute, value) triples.

The quantitative counterpart of the open-triple gap patterns (SURVEY.md
E9): surface patterns like "X employs 12,500 people" / "X raised 40
million dollars" yield the numeric attribute edges (employee counts,
funding, shipment volumes) a web-scale KG aggregates per entity.

Normalization is EXACT-integer end to end: digit groups are de-comma'd
and cast to long, word multipliers (thousand/million/billion) are long
multiplications — never float parsing — so values are oracle-hash-stable
and aggregation-safe (no 3.2e6 ulp drift). Decoy numbers with no
attribute pattern (version strings, years in prose) are not emitted.

Scale shape: one regexp_extract_all per pattern family, group recovery
via transform — map-only JVM codegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NAME = r"([A-Z][a-z]+ [A-Z][a-z]+[0-9]*)"
_NUM = r"([0-9][0-9,]*)"
_MULT = r"(thousand|million|billion)"

# attr -> (regex, subj_group, num_group, mult_group | 0)
NUMFACT_PATTERNS: dict[str, tuple[str, int, int, int]] = {
    "employees": (rf"{_NAME} employs {_NUM} people", 1, 2, 0),
    "raised_usd": (rf"{_NAME} raised {_NUM} {_MULT} dollars", 1, 2, 3),
    "shipped_units": (rf"{_NAME} shipped {_NUM} {_MULT} units", 1, 2, 3),
}

_MULTIPLIERS = {"thousand": 1_000, "million": 1_000_000, "billion": 1_000_000_000}


def _value_col(num: Column, mult_word: Column | None) -> Column:
    base = F.regexp_replace(num, ",", "").cast("long")
    if mult_word is None:
        return base
    m = F.lit(1).cast("long")
    for word, k in _MULTIPLIERS.items():
        m = F.when(mult_word == word, F.lit(k).cast("long")).otherwise(m)
    return base * m


def numfact_col(text: Column) -> Column:
    """array<struct<subj,attr,value>> of every numeric-fact match."""
    def make_fact_of(attr, rx, sg, ng, mg):
        def fact_of(m):
            num = F.regexp_extract(m, rx, ng)
            mult = F.regexp_extract(m, rx, mg) if mg else None
            return F.struct(
                F.regexp_extract(m, rx, sg).alias("subj"),
                F.lit(attr).alias("attr"),
                _value_col(num, mult).alias("value"),
            )

        return fact_of

    arrays = []
    for attr, (rx, sg, ng, mg) in NUMFACT_PATTERNS.items():
        matches = F.regexp_extract_all(text, F.lit(rx), 0)
        arrays.append(F.transform(matches, make_fact_of(attr, rx, sg, ng, mg)))
    return F.concat(*arrays)


def extract_numeric_facts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, subj, attr, value) — one row per extracted numeric fact."""
    return docs.select(
        id_col, F.explode(numfact_col(F.col(text_col))).alias("f")
    ).select(id_col, "f.subj", "f.attr", "f.value")
