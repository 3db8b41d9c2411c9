"""Geotag extraction from meta markup — (url, lat, lon) page coordinates.

Real pages declare coordinates with <meta name="geo.position"
content="lat;lon"> (and the legacy ICBM variant with a comma separator)
— the geographic attribute a KG attaches to Place-typed pages and a
training pipeline uses for geo-balancing. Reference analog: the typed
decorator-attribute parsers (E15/metadata.py family) — a fixed meta
shape pulled with JVM regexps, no HTML parser.

Coordinates are parsed into EXACT milli-degree integers (sign-aware
digit arithmetic — never a float cast), so values are hash-stable and
range predicates (bounding boxes) are integer comparisons. Tags are
case-insensitive, quote-agnostic, attribute-order-free (the house
metadata.py pattern). Content with more or fewer than 3 decimals is
normalized by right-padding/truncating to exactly 3.

Scale shape: map-only regex pass over the html column, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# meta tag whose name is geo.position or ICBM, any attr order/case/quotes
_GEO_TAG_RE = (
    "(?i)<meta\\b[^>]*\\bname\\s*=\\s*[\"'](?:geo\\.position|icbm)[\"'][^>]*>"
)
_GEO_NAME_RE = "(?i)\\bname\\s*=\\s*[\"'](geo\\.position|icbm)[\"']"
_GEO_VAL_RE = "(?i)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"
# lat/lon pair: geo.position uses ';', ICBM uses ','; tolerate spaces
_PAIR_RE = r"^\s*(-?\d+(?:\.\d+)?)\s*[;,]\s*(-?\d+(?:\.\d+)?)\s*$"


def _mdeg(coord: Column) -> Column:
    """'-12.345' -> -12345 exactly: sign * (int_part*1000 + frac3)."""
    sign = F.when(coord.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    int_part = F.regexp_extract(coord, r"-?(\d+)", 1).cast("long")
    frac = F.rpad(F.substring(F.regexp_extract(coord, r"\.(\d+)", 1), 1, 3), 3, "0")
    frac_n = F.coalesce(F.nullif(frac, F.lit("")), F.lit("000")).cast("long")
    return sign * (int_part * 1000 + frac_n)


def geo_entries_col(html_str: Column) -> Column:
    """array<struct<tag,lat_mdeg,lon_mdeg>> of valid geo metas (invalid
    content — missing pair, junk — is dropped, not nulled)."""
    def entry_of(t):
        val = F.regexp_extract(t, _GEO_VAL_RE, 1)
        lat = F.regexp_extract(val, _PAIR_RE, 1)
        lon = F.regexp_extract(val, _PAIR_RE, 2)
        return F.struct(
            F.lower(F.regexp_extract(t, _GEO_NAME_RE, 1)).alias("tag"),
            lat.alias("_lat"),
            lon.alias("_lon"),
        )

    raw = F.transform(F.regexp_extract_all(html_str, F.lit(_GEO_TAG_RE), 0), entry_of)
    ok = F.filter(raw, lambda e: (e["_lat"] != "") & (e["_lon"] != ""))
    return F.transform(
        ok,
        lambda e: F.struct(
            e["tag"].alias("tag"),
            _mdeg(e["_lat"]).alias("lat_mdeg"),
            _mdeg(e["_lon"]).alias("lon_mdeg"),
        ),
    )


def extract_geo(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, tag, lat_mdeg, lon_mdeg) — one row per valid geo meta tag."""
    h = F.col(html_col).cast("string")
    return pages.select(
        url_col, F.explode(geo_entries_col(h)).alias("g")
    ).select(url_col, "g.tag", "g.lat_mdeg", "g.lon_mdeg")
