"""Anchor-to-target (query, passage) pair mining for retrieval training.

The standard weak supervision for dense retrievers and rerankers: the
text a page uses to link at another page is a human-written QUERY for
that page, and the target's extracted text is the POSITIVE passage —
the signal behind anchor-based pretraining corpora (Chang et al.'s
link-based retrieval pretraining family; the text twin of the LAION
img/alt pair mining in extract/images.py). At crawl scale this join is
the cheapest high-volume (query, doc) source there is: no click logs,
no annotation.

Shape: anchors explode map-side (extract/anchors.py, one regexp scan),
the pair join is anchor.target = pages.url — an equi-join on the url
key both sides already carry; counts aggregate with map-side combine.
Quality gates: empty anchor texts are dropped by the extractor,
single-token anchors ("download", "here") are dropped here as query-
useless boilerplate, and self-links (a page linking at itself) are
excluded so a page never becomes its own query.

Columns: query (anchor text), target_url, n_srcs (how many pages link
with this exact text — a confidence weight), passage (target text
truncated to `passage_chars`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.anchors import exploded_anchors


def query_doc_pairs(
    pages: DataFrame,
    min_query_tokens: int = 2,
    passage_chars: int = 160,
    html_col: str = "html",
) -> DataFrame:
    """(query, target_url, n_srcs, passage) over intra-corpus anchors."""
    anchors = exploded_anchors(pages, html_col=html_col).where(
        (F.col("target") != F.col("src_url"))
        & (
            F.size(F.filter(F.split(F.col("anchor_text"), " "), lambda w: w != ""))
            >= min_query_tokens
        )
    )
    targets = pages.select(
        F.col("url").alias("target"),
        F.substring(F.col("text"), 1, passage_chars).alias("passage"),
    )
    return (
        anchors.join(targets, "target")
        .groupBy(
            F.col("anchor_text").alias("query"),
            F.col("target").alias("target_url"),
            "passage",
        )
        .agg(F.count(F.lit(1)).alias("n_srcs"))
        .select("query", "target_url", "n_srcs", "passage")
    )
