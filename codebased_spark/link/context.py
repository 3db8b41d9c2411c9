"""Context-feature disambiguation for ambiguous gazetteer surfaces.

The reference scores entity-link candidates by name similarity plus
where-the-mention-sits evidence; the web-scale analog of the second
signal is distributional context: an ambiguous surface form (one
surface, several candidate entities) is resolved toward the candidate
whose CORPUS-WIDE context profile — token counts harvested from the
context windows of that entity's UNAMBIGUOUS mentions
(extract/contexts.py::mention_windows) — best overlaps the tokens
around this mention. Classic distant-supervision disambiguation, no
labels needed.

Scale shape: the profile table is |entities| x |context vocabulary| —
gazetteer-dimension-sized, built with one (entity, token) combine-agg
and BROADCAST into the scoring join, so the corpus-sized side (one row
per mention context token) never shuffles for the lookup. The only
wide exchange is the per-mention score aggregation, keyed by
(doc, surface) — bounded fan-in (a mention has one window of tokens x
a handful of candidates). Scores are integer count sums: bit-exact
across engines, hash-gateable (the PMI lesson, ADVICE r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.extract.contexts import offset_windows


def context_link_bonus(
    pages: DataFrame,
    mentions: DataFrame,
    exact_map: DataFrame,
    width: int = 40,
    top_k: int = 32,
) -> DataFrame:
    """Surface-level context feature for the fuzzy linker (opt-in via
    extract_triples(context_features=True)).

    The flagship linker scores DISTINCT surfaces, not occurrences — the
    scale choice that keeps linking vocabulary-sized. The context feature
    preserves that shape: each fuzzy surface gets ONE corpus-wide profile
    (token counts over all its mention windows), each entity gets one
    profile from its EXACT mentions' windows, and the feature is their
    cosine — so the output is (surface, entity_id, ctx_sim) pairs, again
    vocabulary-sized, never per-occurrence.

    Scale shape: one url-keyed join re-attaches page text to mention
    offsets (co-partitioned with the page scan), then substr windows +
    token explode stay map-side; both profile aggs are (key, token)
    combine-aggs truncated to the top_k heaviest tokens (deterministic
    token-asc tie-break), so the token-keyed dot-product join is bounded
    by top_k² per (surface, entity) pair that shares any profile token.
    """
    ctx = offset_windows(
        mentions.join(pages.select("url", "text"), "url"), width=width
    )
    toks = ctx.select(
        "surface",
        "exact",
        F.explode(
            F.split(F.concat_ws(" ", F.col("left_ctx"), F.col("right_ctx")), " ")
        ).alias("token"),
    ).where(F.col("token") != "")

    def _profile(df: DataFrame, key: str) -> DataFrame:
        counts = df.groupBy(key, "token").agg(F.count(F.lit(1)).alias("w"))
        win = Window.partitionBy(key).orderBy(F.desc("w"), F.asc("token"))
        kept = counts.withColumn("_rn", F.row_number().over(win)).where(
            F.col("_rn") <= top_k
        )
        norm = kept.groupBy(key).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        return kept.join(norm, key).select(key, "token", "w", "nrm")

    e_prof = _profile(
        toks.where(F.col("exact")).join(
            F.broadcast(exact_map.select("surface", "entity_id")), "surface"
        ),
        "entity_id",
    )
    s_prof = _profile(toks.where(~F.col("exact")), "surface")
    return (
        s_prof.alias("s")
        .join(e_prof.alias("e"), "token")
        .groupBy("surface", "entity_id")
        .agg(
            (
                F.sum(F.col("s.w") * F.col("e.w"))
                / (F.first(F.col("s.nrm")) * F.first(F.col("e.nrm")))
            ).alias("ctx_sim")
        )
    )


def _surface_arity(gaz: DataFrame) -> DataFrame:
    return gaz.groupBy("surface_form").agg(
        F.countDistinct("canonical_id").alias("n_candidates")
    )


def _ctx_tokens(ctxs: DataFrame) -> DataFrame:
    """One row per context-window token (with multiplicity)."""
    tok = F.explode(
        F.split(F.concat_ws(" ", F.col("left_ctx"), F.col("right_ctx")), " ")
    ).alias("token")
    return ctxs.select(
        "doc_id", "surface_form", "canonical_id", "pos", tok
    ).where(F.col("token") != "")


def entity_context_profiles(ctxs: DataFrame, gaz: DataFrame) -> DataFrame:
    """(canonical_id, token, weight): token counts over the context
    windows of UNAMBIGUOUS mentions only — ambiguous surfaces must not
    feed the profiles they are later scored against (circularity).

    `ctxs` is mention_windows() output over the SAME gazetteer.
    """
    unambig = _surface_arity(gaz).where(F.col("n_candidates") == 1)
    rows = ctxs.join(unambig.select("surface_form"), "surface_form", "left_semi")
    return (
        _ctx_tokens(rows)
        .groupBy("canonical_id", "token")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def disambiguate_by_context(ctxs: DataFrame, gaz: DataFrame) -> DataFrame:
    """Resolve every ambiguous mention to its best-supported candidate.

    Output: one row per (doc_id, surface_form) ambiguous mention with
    `best_id` (argmax context-overlap score, ties broken by ascending
    canonical_id — deterministic), integer `best_score`, and
    `n_candidates`. A mention whose window shares no token with any
    profile still resolves (all scores 0 → lexicographic tie-break),
    mirroring the linker's deterministic-fallback discipline
    (link/alias.py collision priority).
    """
    profiles = F.broadcast(entity_context_profiles(ctxs, gaz))
    ambig = _surface_arity(gaz).where(F.col("n_candidates") > 1)
    cand_rows = ctxs.join(
        ambig.select("surface_form", "n_candidates"), "surface_form"
    )
    toks = _ctx_tokens(
        cand_rows.select(
            "doc_id", "surface_form", "canonical_id", "pos", "left_ctx", "right_ctx"
        )
    )
    scored = (
        toks.join(profiles, ["canonical_id", "token"], "left")
        .groupBy("doc_id", "surface_form", "canonical_id")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("score"))
    )
    # argmax with an exact tie-break: max score per mention, then the
    # smallest canonical_id among the candidates that reach it — two
    # aggregations over the same (doc, surface) partitioning, so AQE/
    # exchange reuse keeps it one logical shuffle
    best = scored.groupBy("doc_id", "surface_form").agg(
        F.max("score").alias("best_score")
    )
    return (
        scored.join(best, ["doc_id", "surface_form"])
        .where(F.col("score") == F.col("best_score"))
        .groupBy("doc_id", "surface_form", "best_score")
        .agg(F.min("canonical_id").alias("best_id"))
        .join(ambig.select("surface_form", "n_candidates"), "surface_form")
        .select("doc_id", "surface_form", "best_id", "best_score", "n_candidates")
    )
