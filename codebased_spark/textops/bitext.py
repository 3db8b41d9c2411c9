"""URL-based bitext document alignment (CCAligned-style).

The multilingual training-data op: translated page pairs are mined from
a crawl by URL structure — two urls on the same host whose paths differ
only in the language segment are translation candidates, then a
length-ratio comparability filter drops non-parallel pairs (CCAligned,
El-Kishky et al. 2020; the WMT document-alignment baseline). Downstream,
sentence aligners only ever see these candidate pairs, so this join IS
the scale bottleneck of bitext mining — not the aligner.

Scale shape: the pair key (host + lang-stripped path) is derived
map-side by JVM regexps; the en/de sides join on that narrow key with
only (url, length) carried through the shuffle — never text. At 10^12
pages the join is shuffle-bound on ~tens of bytes per row, and the
length-ratio filter is applied pre-output so non-parallel pairs never
materialize.

Reference analog: SURVEY.md J3 (reference resolution join) — the same
exact-key broadcast/shuffle join machinery aimed at cross-language page
identity instead of symbol identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.util import round_stable

_HOST_RE = r"^(https?://[^/?#]*)"
_LANG_RE = r"^https?://[^/]*/([A-Za-z][A-Za-z-]*)/"
_SLUG_RE = r"^https?://[^/]*/[A-Za-z][A-Za-z-]*(/.*)$"


def bitext_candidates(
    pages: DataFrame,
    src_lang: str = "en",
    dst_lang: str = "de",
    min_ratio: float = 0.5,
    max_ratio: float = 2.0,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(pair_key, src_url, dst_url, src_len, dst_len, len_ratio).

    pair_key = host + path with the language segment removed; a pair is
    kept when RAW dst_len/src_len lies in [min_ratio, max_ratio] (the
    emitted len_ratio column is portable-rounded for the value gate)."""
    u = F.col(url_col)
    parsed = pages.select(
        F.concat(
            F.regexp_extract(u, _HOST_RE, 1), F.regexp_extract(u, _SLUG_RE, 1)
        ).alias("pair_key"),
        F.regexp_extract(u, _LANG_RE, 1).alias("_ulang"),
        u.alias("_url"),
        F.length(text_col).alias("_len"),
    )
    src = parsed.where(F.col("_ulang") == src_lang).select(
        "pair_key",
        F.col("_url").alias("src_url"),
        F.col("_len").alias("src_len"),
    )
    dst = parsed.where(F.col("_ulang") == dst_lang).select(
        "pair_key",
        F.col("_url").alias("dst_url"),
        F.col("_len").alias("dst_len"),
    )
    ratio = F.col("dst_len").cast("double") / F.col("src_len")
    return (
        src.join(dst, "pair_key")
        .where((ratio >= min_ratio) & (ratio <= max_ratio))
        .select(
            "pair_key", "src_url", "dst_url", "src_len", "dst_len",
            round_stable(ratio).alias("len_ratio"),
        )
    )
