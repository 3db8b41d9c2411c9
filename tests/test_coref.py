"""Coreference-lite (extract/coref.py)."""

from __future__ import annotations


def _resolve(spark, texts):
    from codebased_spark.extract.coref import resolve_pronouns

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    gaz = spark.createDataFrame(
        [("ada", "ent:ada", "Person"), ("grace", "ent:grace", "Person"),
         ("acme", "ent:acme", "Org"), ("widget", "ent:widget", "Product")],
        ["surface_form", "entity", "entity_type"],
    )
    return {
        (r.doc_id, r.pronoun_pos, r.pronoun, r.antecedent)
        for r in resolve_pronouns(docs, gaz).collect()
    }


def test_type_agreement_picks_compatible_antecedent(spark):
    # She must skip the MORE RECENT Org mention and bind to the Person
    got = _resolve(spark, ["ada joined acme . She lead it ."])
    assert got == {(0, 5, "She", "ent:ada")}


def test_it_skips_person_they_takes_any(spark):
    got = _resolve(spark, ["acme hired ada . It grew . They agreed ."])
    assert got == {
        (0, 5, "It", "ent:acme"),   # last non-Person, skipping ada
        (0, 8, "They", "ent:ada"),  # last mention of any type
    }


def test_recency_wins_within_class(spark):
    got = _resolve(spark, ["ada met grace . She spoke ."])
    assert got == {(0, 5, "She", "ent:grace")}


def test_no_antecedent_and_lowercase_dropped(spark):
    got = _resolve(spark, ["He arrived . ada waved .",
                           "ada praised it ."])  # lowercase 'it' ignored
    assert got == set()
