"""JSON-LD (schema.org) extraction — the declared-entity markup source.

Modern pages declare their primary entities in
<script type="application/ld+json"> blocks; mining them is the highest-
precision KG-population source on the web (Google's knowledge panels are
fed this way), complementing free-text triples (extract/mentions.py) and
table harvest (extract/tables.py). Reference analog: the structured
declaration extractors (E14/E15) vs the prose ones.

Pipeline shape: one regexp pass collects the raw blocks; F.from_json
(a Catalyst expression — JVM Jackson parse, no Python) projects the
fields a KG sink consumes. Malformed JSON yields NULLs, not failures —
the crawl-tolerance stance used everywhere else in this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Real-web tolerant: case-insensitive, quote-agnostic, and attribute-order
# free — `type` may follow async/defer/nonce/data-* attributes
# (<script async type='application/ld+json'>); VERDICT r3 top task.
_BLOCK_RE = (
    "(?is)<script\\b[^>]*[\\s\"']type\\s*=\\s*[\"']application/ld\\+json[\"']"
    "[^>]*>(.*?)</script\\s*>"
)

# the subset of schema.org fields the KG sink consumes; unknown fields
# are ignored by from_json (open-content model)
JSONLD_SCHEMA = T.StructType(
    [
        T.StructField("@type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("datePublished", T.StringType()),
    ]
)


def jsonld_blocks_col(html_col: Column) -> Column:
    """array<string> of raw ld+json payloads."""
    return F.regexp_extract_all(
        html_col.cast("string"), F.lit(_BLOCK_RE), 1
    )


def jsonld_entities(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, block_idx, entity_type, name, declared_url, date_published)
    — one row per parseable ld+json block; malformed blocks produce a row
    of NULL fields (auditable, droppable with one filter)."""
    blocks = pages.select(
        "url",
        F.posexplode(jsonld_blocks_col(F.col(html_col))).alias("block_idx", "_raw"),
    )
    parsed = blocks.withColumn("_j", F.from_json(F.trim("_raw"), JSONLD_SCHEMA))
    return parsed.select(
        "url",
        "block_idx",
        F.col("_j.`@type`").alias("entity_type"),
        F.col("_j.name").alias("name"),
        F.col("_j.url").alias("declared_url"),
        F.col("_j.datePublished").alias("date_published"),
    )
