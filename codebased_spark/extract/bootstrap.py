"""DIPRE-style relation bootstrapping — patterns from seeds, pairs from
patterns.

The classic semi-supervised KG-construction loop (Brin's DIPRE, AGICHTEIN
& Gravano's Snowball): given a handful of SEED (subj, obj) pairs for a
relation, (1) find corpus contexts "subj <middle> obj" and keep middles
supported by enough DISTINCT seed pairs (one promiscuous pair cannot
promote a junk pattern), then (2) apply the learned patterns to extract
NEW entity pairs the seeds never mentioned. One bootstrap round is
implemented; iterating is a driver loop feeding the output back as seeds.
Reference analog: the gap-pattern open-triple extractors (SURVEY.md E9)
— here the patterns are LEARNED from data instead of hand-written.

Scale shape: positional tokenize + ONE window pass (lead(1)/lead(2))
builds all (subj, middle, obj) token triples — no self-join of the token
table against itself. Seeds and learned patterns are broadcast-sized by
construction; the only corpus-keyed shuffles are the per-doc window sort
(bounded by document length) and the final (subj, pattern, obj)
aggregate (vocabulary-sized after the pattern filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# entity-shaped token: capitalized head, alnum tail (synthetic ids allowed)
_ENTITY_RE = "^[A-Z][a-z0-9]*$"


def token_triples(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, subj, middle, obj): every entity-shaped token pair separated
    by exactly one token. Longer gaps generalize by adding lead() columns;
    one middle token is the deterministic core case."""
    toks = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    trip = toks.select(
        id_col,
        F.col("word").alias("subj"),
        F.lead("word", 1).over(w).alias("middle"),
        F.lead("word", 2).over(w).alias("obj"),
    )
    ent = lambda c: F.col(c).rlike(_ENTITY_RE)  # noqa: E731
    return trip.where(
        ent("subj") & ent("obj") & F.col("middle").isNotNull()
        & ~F.col("middle").rlike(_ENTITY_RE)
    )


def induce_patterns(
    triples: DataFrame, seeds: DataFrame, min_support: int = 2
) -> DataFrame:
    """(pattern, n_seed_pairs): middles co-occurring with >= min_support
    DISTINCT seed pairs. ``seeds``: (subj, obj), broadcast-sized."""
    hits = triples.join(F.broadcast(seeds), ["subj", "obj"])
    return (
        hits.groupBy(F.col("middle").alias("pattern"))
        .agg(F.countDistinct("subj", "obj").alias("n_seed_pairs"))
        .where(F.col("n_seed_pairs") >= min_support)
    )


def bootstrap_new_pairs(
    docs: DataFrame,
    seeds: DataFrame,
    min_support: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(subj, pattern, obj, n_docs): NEW pairs (seed pairs anti-joined
    away) matched by the learned patterns, with document support."""
    trip = token_triples(docs, id_col, text_col).persist()
    learned = induce_patterns(trip, seeds, min_support).select("pattern")
    out = (
        trip.join(F.broadcast(learned), trip.middle == F.col("pattern"))
        .join(F.broadcast(seeds), ["subj", "obj"], "left_anti")
        .groupBy("subj", "pattern", "obj")
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )
    out = out.localCheckpoint(eager=True)
    trip.unpersist()
    return out
