"""Alias harvesting — surface-form synonymy from apposition patterns.

"X, also known as Y" / "X (formerly Y)" / "X, aka Y" sentences are the
web's richest free supervision for entity linking: they yield
(name, alias) pairs that extend the gazetteer and the fuzzy linker's
candidate table without any labeled data. Reference analog: the
import/alias emit family (SURVEY.md E8, link/alias.py consumes exactly
this shape) — here the aliases are MINED from text instead of declared
in code.

Scale shape: one regexp_extract_all pass per pattern family (map-only
JVM codegen); the summary aggregate is vocabulary-sized. Output
direction is alias -> canonical name, ready to union into the linker's
variant-key table (link/alias.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# entity surface: 1-2 capitalized tokens (digits/hyphens allowed inside)
_NAME = r"([A-Z][\w-]*(?: [A-Z][\w-]*)?)"

# pattern -> (regex, name_group, alias_group)
ALIAS_PATTERNS: dict[str, tuple[str, int, int]] = {
    "also_known_as": (rf"{_NAME}, also known as {_NAME}", 1, 2),
    "formerly": (rf"{_NAME} \(formerly {_NAME}\)", 1, 2),
    "aka": (rf"{_NAME}, aka {_NAME}", 1, 2),
}


def alias_pairs_col(text: Column) -> Column:
    """array<struct<name,alias,pattern>> of every apposition match."""
    def make_pair_of(pname, rx, ng, ag):
        def pair_of(m):
            return F.struct(
                F.regexp_extract(m, rx, ng).alias("name"),
                F.regexp_extract(m, rx, ag).alias("alias"),
                F.lit(pname).alias("pattern"),
            )

        return pair_of

    arrays = []
    for pname, (rx, ng, ag) in ALIAS_PATTERNS.items():
        matches = F.regexp_extract_all(text, F.lit(rx), 0)
        arrays.append(F.transform(matches, make_pair_of(pname, rx, ng, ag)))
    return F.concat(*arrays)


def extract_aliases(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, name, alias, pattern) — one row per mined alias assertion."""
    return docs.select(
        id_col, F.explode(alias_pairs_col(F.col(text_col))).alias("a")
    ).select(id_col, "a.name", "a.alias", "a.pattern")


def alias_summary(pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(name, alias, n_docs) — the dedup'd alias table the linker unions
    into its variant keys; document support orders candidates."""
    return pairs.groupBy("name", "alias").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
