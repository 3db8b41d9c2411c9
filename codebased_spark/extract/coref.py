"""Coreference-lite — pronoun resolution to the nearest prior mention.

The cheap coref that materially raises mention recall in KG
construction: a third-person pronoun refers to the most recent
type-compatible entity mention in the same document (He/She -> last
Person, It -> last non-Person, They -> last mention of any type).
Full coref needs a model; this recency-plus-agreement rule is the
classic high-precision baseline (Hobbs-style search order collapsed to
linear recency) and is what web-scale triple extractors actually run.
Reference analog: the reference resolution join (SURVEY.md J3) — same
"attach a dangling reference to its nearest declared symbol" move,
applied to discourse instead of imports.

Scale shape: positional tokenize (posexplode, map-only) -> one
broadcast gazetteer join -> ONE window pass per document ordered by
token position carrying three last-mention-ignoring-nulls columns.
The window partitions by doc_id, so its sort is bounded by document
length, never corpus-sized; no self-join of mentions against pronouns
(the oracle does that quadratic form precisely BECAUSE it is a
different algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# pronoun -> agreement class; capitalized forms only (sentence-initial
# anaphora), lowercase 'it' in object position is deliberately skipped
PRONOUN_CLASS = {"He": "person", "She": "person", "It": "thing", "They": "any"}


def resolve_pronouns(
    docs: DataFrame,
    gaz: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pronoun_pos, pronoun, antecedent) — 1-based token positions.

    ``gaz``: (surface_form, entity, entity_type) — broadcast-sized.
    Pronouns with no prior compatible mention are dropped, not nulled.
    """
    toks = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "word")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "word")
    ev = toks.join(
        F.broadcast(gaz), toks.word == gaz.surface_form, "left"
    ).select(id_col, "pos", "word", "entity", "entity_type")

    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_person = F.last(
        F.when(F.col("entity_type") == "Person", F.col("entity")), ignorenulls=True
    ).over(win)
    last_thing = F.last(
        F.when(F.col("entity_type") != "Person", F.col("entity")), ignorenulls=True
    ).over(win)
    last_any = F.last(F.col("entity"), ignorenulls=True).over(win)

    antecedent = (
        F.when(F.col("word").isin("He", "She"), last_person)
        .when(F.col("word") == "It", last_thing)
        .otherwise(last_any)
    )
    return (
        ev.withColumn("_ante", antecedent)
        .where(F.col("word").isin(*PRONOUN_CLASS) & F.col("_ante").isNotNull())
        .select(
            id_col,
            F.col("pos").alias("pronoun_pos"),
            F.col("word").alias("pronoun"),
            F.col("_ante").alias("antecedent"),
        )
    )
