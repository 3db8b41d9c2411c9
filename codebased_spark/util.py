"""Cross-engine helpers.

round_stable: decimal rounding that is bit-identical between Spark and any
SQL oracle. Engine round() semantics diverge on exact .xxxx5 boundaries
(Spark rounds the shortest decimal representation HALF_UP via BigDecimal;
DuckDB/Postgres round the binary double), which flips the 4th decimal on
values like 0.62845. floor(x * 10^d + 0.5) / 10^d uses only IEEE-exact
mul/add/floor/div, so both engines agree bit-for-bit. Only valid for
non-negative values (all our ratios/similarities).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_stable(col: Column, digits: int = 4) -> Column:
    scale = 10**digits
    return F.floor(col * scale + F.lit(0.5)) / scale


def round_stable_sql(expr: str, digits: int = 4) -> str:
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def sanitize_long_key(col: Column, max_len: int = 100, keep: int = 90) -> Column:
    """Truncate pathological keys, keeping uniqueness via a hash suffix.

    Reference parity: extractor.py:806-832 / javascript.py:974-999 truncate
    >100-char names (chained d3 call expressions) to `prefix...md5[:8]`.
    Pathologically long keys are also a skew/memory hazard in shuffles —
    sanitize before grouping on untrusted key columns.
    """
    return F.when(
        F.length(col) > max_len,
        F.concat(
            F.substring(col, 1, keep), F.lit("..."), F.substring(F.md5(col), 1, 8)
        ),
    ).otherwise(col)
