"""Cross-lingual entity alignment over hreflang translation groups.

hreflang alternates (sources/canonical.py) declare that a set of pages
are TRANSLATIONS of one another — per-language variants of one logical
document. That grouping is an alignment signal a multilingual KG wants:
an entity mentioned by the en AND de variants of the same logical page
is translation-confirmed (asserted independently in two languages),
while an entity only one variant mentions is language-local — lower
confidence, or genuinely locale-specific content.

crosslingual_entity_support joins translation-group membership with
per-page entity mentions and scores each (group, entity) by how many
languages attest it. The cluster key is the group's declared x-default
target (the common real-web convention: every variant points its
x-default at the same hub URL), which makes grouping a plain key — no
iterative component computation. Sites without an x-default hub fall
back to connected components over the alternate edges (link/cc.py), the
same machinery the canonicalizer uses.

Reference analog: the two-pass entity resolution (analyzer.py second
pass) joins mentions against a registry; here the registry axis is the
translation group instead of the alias table.

Scale shape: one url-keyed equi-join (members x mentions), a distinct
on four narrow columns, one map-side-combinable aggregate. Members is
page-count-sized; nothing is corpus-global; no skew beyond what AQE
handles (a viral page's translation group is still only its language
variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crosslingual_entity_support(
    members: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Score entities by cross-language attestation.

    members:  (cluster_id, url, lang) — one row per page in a
              translation group (cluster_id = the group's hub url).
    mentions: (url, entity_id) — per-page entity observations
              (duplicates fine; counted once per page).

    Returns (cluster_id, entity_id, n_langs, n_pages, langs) where
    langs is the sorted comma-joined language list — n_langs >= 2 is
    the translation-confirmed signal.
    """
    attested = (
        members.join(mentions, "url")
        .select("cluster_id", "entity_id", "lang", "url")
        .distinct()
    )
    return attested.groupBy("cluster_id", "entity_id").agg(
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("url").alias("n_pages"),
        F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs"),
    )
