"""Page-identity closure: sameAs fusion across equivalence families.

A crawl asserts page identity through several INDEPENDENT channels —
meta-refresh redirect stubs (extract/redirects.py), `<link
rel="canonical">` declarations (sources/canonical.py), hreflang
x-default hubs, mirror-host rules — and each one alone yields only a
partial collapse: a moved page's old url redirects to a variant that in
turn declares a canonical hub, so the OLD url and the HUB are the same
logical page even though no single declaration connects them. KG
construction needs the transitive fusion (owl:sameAs closure): one
identity id per equivalence class over the UNION of all families,
plus per-family provenance counts so downstream consumers can weigh
how each identity was established.

Scale shape: the edge set is declaration-sized (pages that carry a
redirect or canonical tag), orders of magnitude below the corpus;
the closure is link/cc.py's adaptive min-label connected components
(driver union-find below the threshold, distributed min-label loop
above — both produce identical labels); the provenance counts are one
family-keyed join + aggregate against the labels. Nothing here ever
shuffles page HTML — only urls.

Reference analog: canonical rewrite -> CC fixpoint (SURVEY J8) fuses
alias edges into symbol identity; this is the same fixpoint over web
page identity with multi-family provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.link.cc import connected_components


def identity_closure(edges: DataFrame) -> DataFrame:
    """Fuse labeled equivalence edges into identity clusters.

    edges: (src, dst, family) — family in {'redirect', 'canonical', ...};
    direction is ignored (identity is symmetric).

    Returns one row per distinct url: (url, identity_id, n_urls,
    n_redirect, n_canonical) where identity_id = min url in the
    equivalence class (binary string order, identical in Spark and
    DuckDB for ascii urls) and the n_* columns are the class's edge
    counts per family.
    """
    # edges feed BOTH the component computation and the provenance
    # aggregate below; deriving them means running the markup
    # extractors, so materialize the declaration-sized edge table once
    # instead of re-extracting per consumer (the expensive part at
    # real scale is the regex pass over HTML, not these rows)
    edges = edges.localCheckpoint(eager=True)
    labels = connected_components(edges, src="src", dst="dst").select(
        F.col("id").alias("url"), F.col("comp").alias("identity_id")
    )
    per_edge = edges.join(
        labels.withColumnRenamed("url", "src"), "src"
    ).groupBy("identity_id").agg(
        F.sum((F.col("family") == "redirect").cast("long")).alias("n_redirect"),
        F.sum((F.col("family") == "canonical").cast("long")).alias("n_canonical"),
    )
    sizes = labels.groupBy("identity_id").agg(F.count(F.lit(1)).alias("n_urls"))
    return (
        labels.join(sizes, "identity_id")
        .join(per_edge, "identity_id", "left")
        .select(
            "url",
            "identity_id",
            "n_urls",
            F.coalesce("n_redirect", F.lit(0)).alias("n_redirect"),
            F.coalesce("n_canonical", F.lit(0)).alias("n_canonical"),
        )
    )
