"""Tokenization and shingling as pure JVM column expressions.

Everything here stays inside whole-stage codegen — no Python on the hot
path. A 100 TB corpus is shingled map-side with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (split+filter, JVM)."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def shingles_col(toks: Column, n: int) -> Column:
    """Distinct word n-grams of `toks` as an array<string> column.

    sequence+slice+concat_ws is the codegen-friendly way to window an array;
    the when() guard avoids sequence(1, 0) errors on short docs.
    """
    if n <= 1:
        return F.array_distinct(toks)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_shingles(df, text_col: str = "text", n: int = 3, out: str = "shingles"):
    """df + distinct n-gram shingle array column."""
    return df.withColumn(out, shingles_col(tokens_col(F.col(text_col)), n))
