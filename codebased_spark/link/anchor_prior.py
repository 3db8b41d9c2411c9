"""Anchor-dictionary prior as an entity-link feature family.

Adapts the Wikipedia-anchor commonness prior (extract/anchors.py::
anchor_dictionary — P(target | surface) from corpus-wide link counts) to
the (surface, entity_id, ctx_sim) feature-table slot link_fuzzy_mentions
already consumes (`context_bonus`): candidates re-rank by name score +
weight * prior, while the acceptance threshold still applies to the name
score alone — the prior can break ties toward the entity the web links
that surface to, but can never admit a link the name similarity rejects
(same containment discipline as the context-feature family).

Scale shape: anchor_dict and page_entities are both vocabulary/entity-
sized tables — the join here never touches the corpus; the corpus was
paid once inside anchor_dictionary's count shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anchor_prior_bonus(
    anchor_dict: DataFrame, page_entities: DataFrame
) -> DataFrame:
    """(surface, entity_id, ctx_sim): max anchor prior per (surface,
    entity), bridged from anchor TARGET urls to entity ids via
    page_entities (url, entity_id) — the page-to-entity identity the
    graph already materializes for entity pages."""
    return (
        anchor_dict.join(
            page_entities, anchor_dict["target"] == page_entities["url"]
        )
        .select(
            F.col("anchor_text").alias("surface"),
            "entity_id",
            F.col("prior"),
        )
        .groupBy("surface", "entity_id")
        .agg(F.max("prior").alias("ctx_sim"))
    )
