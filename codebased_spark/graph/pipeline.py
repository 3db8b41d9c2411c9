"""End-to-end KG construction: pages → triples → canonical nodes/edges.

Mirror of the reference's `codebased update` lifecycle (SURVEY.md §3.1),
restated as Spark stages:

  read pages → [route by lang, S4/S5 analog]
      → Arrow-UDF text extraction (byte-identical invariant)
      → JVM-side href extraction → LINKS_TO triples
      → Arrow-UDF mention scan + gap-pattern relations (one pass)
      → exact link: broadcast join vs alias table (J1/J2)
      → fuzzy link: blocking join + TF-IDF char-ngram scoring (J4 upgrade)
      → external stubs for unlinked candidates (J7 anti-join)
      → connected components over alias edges → canonical ids (J8 fixpoint)
      → nodes/edges with deterministic sha2 uids (E11), deduped (A8)

Shuffle budget (the thing that matters at 100 TB): one shuffle for the
mention explode→join (broadcast, so none), one for the distinct on fuzzy
surfaces (tiny), CC rounds over the *alias vocabulary* (≪ corpus size —
distinct surfaces, not mentions), and one dedup per output table. The corpus
itself is never shuffled: every per-document stage is map-only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codebased_spark.extract.html_text import href_targets, with_text
from codebased_spark.extract.mentions import with_mentions
from codebased_spark.link.alias import build_alias_table, link_fuzzy_mentions
from codebased_spark.link.cc import connected_components

MENTION_LANGS = ("en",)  # gazetteer is English; routing analog of file_types.py:47-74


@dataclass
class GraphResult:
    triples: DataFrame  # (url, subj, pred, obj)
    nodes: DataFrame  # (id, uid, name, type, meta)
    edges: DataFrame  # (src, dst, rel_type, meta)
    mentions: DataFrame  # (url, surface, mstart, mend, exact, entity_id)
    # internal persisted fan-out points (flat scan, canonical map) — SQL
    # cache entries live in the CacheManager until explicitly unpersisted,
    # so loops that run the pipeline repeatedly (benchmark warmups,
    # services, incremental batches) must release finished results or the
    # entries accumulate for the life of the session
    cached: tuple = ()

    def release(self) -> None:
        """Unpersist the pipeline's internal caches. Call when this
        result's DataFrames are no longer needed; actions on them after
        release still work (lineage recomputes) but pay the full scan."""
        for df in self.cached:
            try:
                df.unpersist()
            except Exception:
                pass


def extract_triples(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer: DataFrame,
    fuzzy_threshold: float = 0.55,
    use_given_text: bool = False,
    persist: bool = True,
    max_html_bytes: int | None = 10 * 1024 * 1024,
    external_blocklist: list[str] | None = None,
    max_broadcast_surfaces: int = 2_000_000,
    mention_heuristics: tuple[str, ...] | None = None,
    dedupe_captures: bool = False,
    canonical_collapse: bool = False,
    persist_triples: bool = False,
    context_features: bool = False,
    resolve_links: bool = True,
) -> GraphResult:
    """Run extraction + linking + canonicalization.

    `persist=True` (default) caches the two fan-out points — the scanned
    extraction output (consumed by mention-, relation- and node-building
    branches) and the canonical surface map — at MEMORY_AND_DISK. Without
    this every downstream branch re-runs the scan UDFs over the corpus
    (measured 2.5x end-to-end at 20k docs). At cluster scale the same
    role is played by the manifest runner materializing per-bucket output;
    MEMORY_AND_DISK spills rather than OOMs on big partitions.

    `mention_heuristics` selects the fuzzy-candidate detector family
    (extract/mentions.CANDIDATE_HEURISTICS — E10 in full: capseq /
    allcaps / quoted); None keeps the proper-name default.

    `dedupe_captures` / `canonical_collapse` are the two opt-in identity
    pre-steps: latest capture wins per url (sources/recrawl.py), then
    declared-variant pages collapse onto their <link rel="canonical">
    target (sources/canonical.py) — both one combined aggregation each.

    `context_features=True` adds the corpus-context rank feature to fuzzy
    candidate scoring (link/context.py::context_link_bonus): surface- and
    entity-level context profiles re-rank near-tied candidates while the
    acceptance threshold stays on the name score. Off by default — it
    costs one url-keyed text re-join plus two vocabulary-sized aggs.

    `max_broadcast_surfaces` guards the one driver-memory-bound step: the
    automaton path collects the alias vocabulary for the executor-side
    broadcast (the right plan up to ~10^6-10^7 surfaces). Above the
    guard, the pipeline switches to the distributed dictionary JOIN scan
    (extract/mentions_join.py) — same mention/relation semantics on
    tokenized text, dictionary never leaves the cluster — instead of
    OOMing the driver silently. The probe is one fused limit+collect job.
    """
    alias_table = build_alias_table(gazetteer)
    # ONE probe job sizes AND fetches the vocabulary (cc.py discipline:
    # a count-then-collect pair would pay two fixed job overheads)
    probe = alias_table.select("alias_key").limit(max_broadcast_surfaces + 1).collect()
    use_join_scan = len(probe) > max_broadcast_surfaces
    surfaces = [] if use_join_scan else [r.alias_key for r in probe]

    # recrawl collapse FIRST (latest warc_ts wins per url) so stale
    # captures never reach the decode UDF — incremental.py:159-274's
    # one-row-per-path rule, web-table form (sources/recrawl.py)
    if dedupe_captures and "warc_ts" in pages.columns:
        from codebased_spark.sources.recrawl import latest_captures

        content = "html" if "html" in pages.columns else "text"
        pages = latest_captures(pages, content_col=content).drop("n_captures")

    # canonical collapse second (recrawl first settles WHICH capture of a
    # variant speaks, then <link rel="canonical"> settles page identity):
    # triples from declared variants attach to the canonical url
    if canonical_collapse and "html" in pages.columns:
        from codebased_spark.sources.canonical import collapse_canonical

        pages = collapse_canonical(pages).drop("src_url", "n_variants")

    # size guard before any UDF work (reference base.py:146-149 max_file_size
    # skip): pathological documents are dropped map-side, never decoded
    if max_html_bytes is not None and not use_given_text:
        pages = pages.where(F.length("html") <= max_html_bytes)

    pages = pages if use_given_text else with_text(pages, "html", "text")
    # text-only corpora (no html column) simply have no hyperlink edges
    links_expr = (
        href_targets(F.col("html"))
        if "html" in pages.columns
        else F.array().cast("array<string>")
    )
    pages = pages.withColumn("links", links_expr)

    # LINKS_TO — all languages, pure JVM. The distinct runs on the narrow
    # (url, href) pair; subj ("page:"+url) and the constant pred are
    # projected AFTER the shuffle — at 10^12 rows the dedup shuffle is the
    # dominant byte-mover and must not carry derivable columns.
    #
    # resolve_links (default on): hrefs resolve to absolute urls per RFC
    # 3986 against the page's <base href> (or the page url) BEFORE the
    # dedup, so relative aliases of the same target ("a/b" vs "./a/b")
    # collapse to one edge — on real crawl HTML most hrefs are relative
    # and an unresolved link graph silently drops most of its edges.
    # Absolute hrefs pass through verbatim (fixture oracles unchanged).
    if resolve_links and "html" in pages.columns:
        from codebased_spark.extract.urlops import base_href_col, resolve_url_col

        base_tag = base_href_col(F.col("html"))
        link_base = F.when(base_tag == "", F.col("url")).otherwise(
            resolve_url_col(F.col("url"), base_tag)
        )
        exploded = pages.select(
            F.col("url"), link_base.alias("_b"), F.explode("links").alias("_h")
        ).select(
            "url", resolve_url_col(F.col("_b"), F.col("_h")).alias("href")
        ).where(F.col("href").rlike("(?i)^https?://"))  # no mailto:/js: edges
    else:
        exploded = pages.select(F.col("url"), F.explode("links").alias("href"))
    link_triples = (
        exploded
        .distinct()
        .select(
            F.col("url"),
            F.concat(F.lit("page:"), F.col("url")).alias("subj"),
            F.lit("LINKS_TO").alias("pred"),
            F.concat(F.lit("page:"), F.col("href")).alias("obj"),
        )
    )

    from codebased_spark.extract.mentions import DEFAULT_HEURISTICS

    heur = tuple(mention_heuristics) if mention_heuristics else DEFAULT_HEURISTICS
    mention_pages = pages.where(F.col("lang").isin(*MENTION_LANGS))
    if use_join_scan:
        # big-gazetteer fallback: distributed dictionary join, same flat
        # row shape (mentions_join runs the same finish_scan tail)
        from codebased_spark.extract.mentions_join import scan_mentions_join

        flat = scan_mentions_join(
            mention_pages, alias_table, text_col="text", heuristics=heur
        )
    else:
        scanned = with_mentions(
            mention_pages, surfaces, "text", heuristics=heur
        ).select("url", "extraction")

        # Flatten BOTH extraction arrays in one explode and persist the
        # flat rows. Caching the nested array<struct> column instead is a
        # trap: the columnar cache cannot codegen-decode nested arrays, so
        # every downstream branch re-pays an object-materialization decode
        # that dominates the whole pipeline (measured ~40s per pass at 1M
        # docs vs ~4s for flat rows) and does not scale with cores.
        null_s = F.lit(None).cast("string")
        m_structs = F.transform(
            "extraction.mentions",
            lambda m: F.struct(
                F.lit("m").alias("kind"),
                m["surface"].alias("surface"),
                m["mstart"].alias("mstart"),
                m["mend"].alias("mend"),
                m["exact"].alias("exact"),
                null_s.alias("subj"),
                null_s.alias("pred"),
                null_s.alias("obj"),
            ),
        )
        r_structs = F.transform(
            "extraction.rels",
            lambda r: F.struct(
                F.lit("r").alias("kind"),
                null_s.alias("surface"),
                F.lit(None).cast("int").alias("mstart"),
                F.lit(None).cast("int").alias("mend"),
                F.lit(None).cast("boolean").alias("exact"),
                r["subj"].alias("subj"),
                r["pred"].alias("pred"),
                r["obj"].alias("obj"),
            ),
        )
        flat = scanned.select(
            "url", F.explode(F.concat(m_structs, r_structs)).alias("x")
        ).select("url", "x.*")
    if persist:
        from pyspark import StorageLevel

        flat = flat.persist(StorageLevel.MEMORY_AND_DISK)

    mentions = flat.where(F.col("kind") == "m").select(
        "url", "surface", "mstart", "mend", "exact"
    )
    rels = flat.where(F.col("kind") == "r").select("url", "subj", "pred", "obj")

    # exact surface → entity (broadcast: the alias table is the small dim).
    # link_score = alias specificity: a canonical-surface match is full
    # confidence, a generated-variant (acronym/stripped/url-form) match is
    # scaled down — which also makes the canonical surface win the entity
    # name selection in _materialize_graph.
    exact_map = alias_table.select(
        F.col("alias_key").alias("surface"),
        "entity_id",
        "entity_type",
        F.col("specificity").cast("double").alias("link_score"),
    )
    fuzzy_surfaces = mentions.where(~F.col("exact")).select("surface").distinct()
    # short-circuit: clean corpora have no fuzzy candidates, and the TF-IDF
    # scoring stage costs several fixed jobs. fuzzy_surfaces is vocabulary-
    # sized (distinct surfaces, not mentions), so isEmpty() is cheap and
    # doubles as the materialization point for the persisted scan. The
    # short-circuit must replace BOTH the fuzzy map AND the stub source
    # with empty literals: the downstream CC runs count/collect jobs over
    # surface_map, and a corpus-scanning subtree left in the (empty)
    # ext branch would re-execute the whole mention scan per job —
    # measured ~7s of pure fixed cost per pipeline call.
    if fuzzy_surfaces.isEmpty():
        fuzzy_map = spark.createDataFrame(
            [], "surface string, entity_id string, entity_type string, link_score double"
        )
        unlinked = spark.createDataFrame([], "surface string")
    else:
        # opt-in context feature (link/context.py): corpus-wide context
        # profiles re-rank near-tied candidates; the threshold decision
        # stays name-score-gated, so default-off P/R is unaffected
        ctx_bonus = None
        if context_features:
            from codebased_spark.link.context import context_link_bonus

            ctx_bonus = context_link_bonus(mention_pages, mentions, exact_map)
        fuzzy_map = link_fuzzy_mentions(
            spark, fuzzy_surfaces, alias_table, threshold=fuzzy_threshold,
            context_bonus=ctx_bonus,
        )
        # unlinked candidates → external stubs (J7: no dangling refs),
        # except known-external surfaces on the broadcast blocklist,
        # which are dropped entirely — the reference skips
        # @angular/rxjs/lodash prefixes before probing
        # (extractor.py:393-426); the web analog is boilerplate chrome
        # names (social widgets, cookie-banner vendors) that would
        # otherwise pollute the entity table with one stub per spelling
        # (J5).
        unlinked = fuzzy_surfaces.join(fuzzy_map, "surface", "left_anti")
    if external_blocklist:
        bl = F.broadcast(
            spark.createDataFrame(
                [(s.lower(),) for s in external_blocklist], ["blocked"]
            )
        )
        unlinked = unlinked.join(
            bl, F.lower(F.col("surface")) == F.col("blocked"), "left_anti"
        )
    ext_map = (
        unlinked
        .withColumn(
            "entity_id", F.concat(F.lit("ext:"), F.sha2(F.col("surface"), 256))
        )
        .withColumn("entity_type", F.lit("External"))
        .withColumn("link_score", F.lit(0.0))
    )
    surface_map = exact_map.unionByName(fuzzy_map).unionByName(ext_map)

    # canonicalization: CC over alias edges (sf:surface ↔ entity id).
    # The vocabulary is tiny relative to the corpus — CC never touches pages.
    alias_edges = surface_map.select(
        F.concat(F.lit("sf:"), F.col("surface")).alias("src"),
        F.col("entity_id").alias("dst"),
    )
    comps = connected_components(alias_edges)
    canon = (
        surface_map.join(
            comps.withColumnRenamed("id", "entity_id"), "entity_id", "left"
        )
        .withColumn("canonical_id", F.coalesce("comp", "entity_id"))
        .select("surface", "entity_id", "canonical_id", "entity_type", "link_score")
    )
    if persist:
        from pyspark import StorageLevel

        canon = canon.persist(StorageLevel.MEMORY_AND_DISK)
    canon_b = F.broadcast(canon)

    linked = mentions.join(canon_b, "surface", "left").select(
        "url", "surface", "mstart", "mend", "exact",
        F.col("canonical_id").alias("entity_id"), "entity_type", "link_score",
    )

    mention_triples = (
        linked.where(F.col("entity_id").isNotNull())
        .select("url", F.col("entity_id").alias("obj"))
        .distinct()  # narrow (url, obj) shuffle; subj/pred derived below
        .select(
            "url",
            F.concat(F.lit("page:"), F.col("url")).alias("subj"),
            F.lit("MENTIONS").alias("pred"),
            "obj",
        )
    )

    rel_triples = (
        rels.join(
            canon_b.select(F.col("surface").alias("subj"), F.col("canonical_id").alias("subj_id")),
            "subj",
        )
        .join(
            canon_b.select(F.col("surface").alias("obj"), F.col("canonical_id").alias("obj_id")),
            "obj",
        )
        .select(
            "url",
            F.col("subj_id").alias("subj"),
            F.col("pred"),
            F.col("obj_id").alias("obj"),
        )
        .distinct()
    )

    triples = mention_triples.unionByName(rel_triples).unionByName(link_triples)
    if persist and persist_triples:
        from pyspark import StorageLevel

        # third fan-out point for GRAPH-MATERIALIZING callers (the
        # manifest runner, stats): triples feed the caller's action AND
        # the node/edge build (used_ids, stubs, edge dedup), so caching
        # them saves re-running the three dedup shuffles per consumer.
        # OFF by default: a triples-only consumer (the headline
        # throughput path) would pay the corpus-sized cache write for
        # nothing (measured ~25% of end-to-end at 200k docs), and at
        # 100 TB a corpus-sized cache is a spill risk — flat/canon stay
        # cached either way, so an unpersisted rebuild re-pays only the
        # narrow dedup shuffles, never the scan UDFs.
        triples = triples.persist(StorageLevel.MEMORY_AND_DISK)

    nodes, edges = _materialize_graph(pages, canon, triples)
    cached = (
        (flat, canon, triples) if (persist and persist_triples)
        else (flat, canon) if persist
        else ()
    )
    return GraphResult(
        triples=triples, nodes=nodes, edges=edges, mentions=linked, cached=cached
    )


def _materialize_graph(
    pages: DataFrame, canon: DataFrame, triples: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Typed node/edge tables with deterministic content-hash uids.

    uid = sha2(type:name, 256) — the determinism that makes task retries and
    re-runs idempotent (reference E11, python.py:445-462). Dedup is
    first-seen-indifferent because ids are content hashes (A8).
    """
    # Page nodes carry the structured markup metadata map (E15/E4/E6:
    # title + og:* — the reference's per-entity docstring/flags analog),
    # extracted JVM-side; absent when the pipeline ran text-only.
    from codebased_spark.extract.metadata import page_meta_col

    null_meta = F.lit(None).cast("map<string,string>")
    meta_expr = (
        page_meta_col(F.col("html")) if "html" in pages.columns else null_meta
    )
    page_nodes = pages.select(
        F.concat(F.lit("page:"), F.col("url")).alias("id"),
        F.col("url").alias("name"),
        F.lit("Page").alias("type"),
        F.col("url").alias("source_url"),
        meta_expr.alias("meta"),
    )
    # only entities actually referenced by a triple become nodes (the
    # reference materializes extracted entities, not the whole gazetteer)
    used_ids = (
        triples.where(F.col("pred") != "LINKS_TO")
        .select(F.col("obj").alias("canonical_id"))
        .union(
            triples.where(~F.col("pred").isin("LINKS_TO", "MENTIONS")).select(
                F.col("subj").alias("canonical_id")
            )
        )
        .distinct()
    )
    # one max_by of a struct keeps name/type from the SAME alias row, and
    # the (link_score, surface) sort key makes ties among equal-score
    # aliases deterministic (an entity with several exact surfaces must
    # not flip names between runs)
    # entity nodes carry per-entity metadata (E6 rich flags analog):
    # alias-count and the best link confidence that produced the name
    entity_nodes = (
        canon.join(used_ids, "canonical_id", "left_semi")
        .groupBy(F.col("canonical_id").alias("id"))
        .agg(
            F.max_by(
                F.struct(F.col("surface"), F.col("entity_type")),
                F.struct(F.col("link_score"), F.col("surface")),
            ).alias("best"),
            F.countDistinct("surface").alias("_n_aliases"),
            F.max("link_score").alias("_best_score"),
        )
        .select(
            "id",
            F.col("best.surface").alias("name"),
            F.col("best.entity_type").alias("type"),
            F.lit(None).cast("string").alias("source_url"),
            F.create_map(
                F.lit("n_aliases"), F.col("_n_aliases").cast("string"),
                F.lit("link_score"), F.col("_best_score").cast("string"),
            ).alias("meta"),
        )
    )
    # LINKS_TO targets outside the corpus → external Page stubs (J7)
    stub_pages = (
        triples.where(F.col("pred") == "LINKS_TO")
        .select(F.col("obj").alias("id"))
        .distinct()
        .join(page_nodes.select("id"), "id", "left_anti")
        .select(
            "id",
            F.regexp_replace("id", "^page:", "").alias("name"),
            F.lit("ExternalPage").alias("type"),
            F.lit(None).cast("string").alias("source_url"),
            F.lit(None).cast("map<string,string>").alias("meta"),
        )
    )
    nodes = (
        page_nodes.unionByName(entity_nodes).unionByName(stub_pages)
        .dropDuplicates(["id"])
        .withColumn("uid", F.sha2(F.concat_ws(":", "type", "name"), 256))
        .select("id", "uid", "name", "type", "source_url", "meta")
    )
    # deterministic representative: min(url) per edge key, not whichever
    # row dropDuplicates happens to see first (task order varies between
    # runs); the meta map is built AFTER the aggregate so the shuffle
    # carries one url string, not a map
    edges = (
        triples.groupBy(
            F.col("subj").alias("src"),
            F.col("obj").alias("dst"),
            F.col("pred").alias("rel_type"),
        )
        .agg(F.min("url").alias("_url"))
        .select(
            "src", "dst", "rel_type",
            F.create_map(F.lit("source_url"), F.col("_url")).alias("meta"),
        )
    )
    return nodes, edges


def build_graph(
    spark: SparkSession, pages: DataFrame, gazetteer: DataFrame, **kw
) -> GraphResult:
    return extract_triples(spark, pages, gazetteer, **kw)
