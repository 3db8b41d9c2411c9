"""Image-alt pair mining — the LAION-style caption-pair extractor.

Image-text training corpora (LAION, CC-variants) are mined exactly like
this: every <img> whose alt text passes a minimal quality bar yields an
(image_url, caption) candidate pair; the image url resolves against the
page's <base href>/url like any other reference, and pairs join
downstream with the media decode stage (media/) for the bytes.

House markup rules apply: case-insensitive, quote-agnostic,
attribute-order-free (src and alt in either order), map-only JVM
regexps; the only shuffle is whatever the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import base_href_col, resolve_url_col

_IMG_RE = r"(?is)<img\b[^>]*>"
_SRC_RE = r"(?is)\bsrc\s*=\s*[\"']([^\"']+)[\"']"
_ALT_RE = r"(?is)\balt\s*=\s*[\"']([^\"']*)[\"']"


def image_alt_pairs(
    pages: DataFrame, html_col: str = "html", min_alt_chars: int = 5
) -> DataFrame:
    """(src_url, image_url, alt): one row per <img> with a resolvable src
    and an alt of at least min_alt_chars after whitespace collapse —
    empty/placeholder alts (the decorative-image convention) are
    dropped, which is the LAION filter's first rule."""
    h = F.col(html_col).cast("string")
    base_tag = base_href_col(h)
    base = F.when(base_tag == "", F.col("url")).otherwise(
        resolve_url_col(F.col("url"), base_tag)
    )
    tags = pages.select(
        F.col("url").alias("src_url"),
        base.alias("_base"),
        F.explode(F.regexp_extract_all(h, F.lit(_IMG_RE), 0)).alias("_t"),
    )
    src = F.regexp_extract("_t", _SRC_RE, 1)
    alt = F.trim(F.regexp_replace(F.regexp_extract("_t", _ALT_RE, 1), r"\s+", " "))
    return (
        tags.where(src != "")  # srcless <img> would resolve to the base itself
        .select(
            "src_url",
            resolve_url_col(F.col("_base"), src).alias("image_url"),
            alt.alias("alt"),
        )
        .where(
            (F.length("alt") >= min_alt_chars)
            & F.col("image_url").rlike("(?i)^https?://")
        )
    )


_MEDIA_TAG_RE = r"(?is)<(?:video|audio|source)\b[^>]*>"
_TYPE_RE = r"(?is)\btype\s*=\s*[\"']([^\"']+)[\"']"


def media_src_pairs(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_url, media_url, media_type): <video>/<audio>/<source> srcs,
    RFC-resolved like image srcs — the audio/video half of multimodal
    discovery. media_type is the declared MIME type when present, else
    inferred from the url extension ('' when neither); the downstream
    decode stage (media/) verifies real container bytes anyway."""
    h = F.col(html_col).cast("string")
    base_tag = base_href_col(h)
    base = F.when(base_tag == "", F.col("url")).otherwise(
        resolve_url_col(F.col("url"), base_tag)
    )
    tags = pages.select(
        F.col("url").alias("src_url"),
        base.alias("_base"),
        F.explode(F.regexp_extract_all(h, F.lit(_MEDIA_TAG_RE), 0)).alias("_t"),
    )
    src = F.regexp_extract("_t", _SRC_RE, 1)
    declared = F.lower(F.regexp_extract("_t", _TYPE_RE, 1))
    ext = F.lower(F.regexp_extract(src, r"\.([A-Za-z0-9]+)(?:[?#]|$)", 1))
    inferred = (
        F.when(ext.isin("mp4", "webm", "mov"), F.concat(F.lit("video/"), ext))
        .when(ext.isin("mp3", "wav", "ogg", "flac"), F.concat(F.lit("audio/"), ext))
        .otherwise(F.lit(""))
    )
    return (
        tags.where(src != "")
        .select(
            "src_url",
            resolve_url_col(F.col("_base"), src).alias("media_url"),
            F.when(declared != "", declared).otherwise(inferred).alias("media_type"),
        )
        .where(F.col("media_url").rlike("(?i)^https?://"))
    )
