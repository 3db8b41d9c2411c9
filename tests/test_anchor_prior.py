"""Anchor-dictionary prior feeding the fuzzy linker (link/anchor_prior.py)."""

from __future__ import annotations

from codebased_spark.extract.anchors import anchor_dictionary
from codebased_spark.link.alias import build_alias_table, link_fuzzy_mentions
from codebased_spark.link.anchor_prior import anchor_prior_bonus


def test_anchor_prior_flips_exact_name_tie(spark):
    """End-to-end: real pages -> anchor dictionary -> prior bonus ->
    link_fuzzy_mentions re-ranks an exact name tie toward the entity the
    web links the surface to, without touching the name score."""
    # the corpus links the surface 'acme corpx' to corpa's page twice
    # and corpb's once -> prior 2/3 vs 1/3
    def page(url, *anchors):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in anchors)
        return (url, f"<html><body>{body}</body></html>".encode())

    pages = spark.createDataFrame(
        [
            page("https://s.org/1", ("https://w.org/corpa", "acme corpx")),
            page("https://s.org/2", ("https://w.org/corpa", "acme corpx")),
            page("https://s.org/3", ("https://w.org/corpb", "acme corpx")),
        ],
        ["url", "html"],
    )
    page_entities = spark.createDataFrame(
        [
            ("https://w.org/corpa", "ent:z:corpa"),
            ("https://w.org/corpb", "ent:a:corpb"),
        ],
        ["url", "entity_id"],
    )
    bonus = anchor_prior_bonus(anchor_dictionary(pages), page_entities)
    got = {
        (r.surface, r.entity_id): r.ctx_sim for r in bonus.collect()
    }
    assert got == {
        ("acme corpx", "ent:z:corpa"): 0.6667,
        ("acme corpx", "ent:a:corpb"): 0.3333,
    }

    gaz = spark.createDataFrame(
        [
            ("acme corpa", "ent:z:corpa", "Org", 1.0),
            ("acme corpb", "ent:a:corpb", "Org", 1.0),
        ],
        ["surface_form", "canonical_id", "entity_type", "weight"],
    )
    alias_table = build_alias_table(gaz, variants=False)
    fuzzy = spark.createDataFrame([("acme corpx",)], ["surface"])

    base = link_fuzzy_mentions(spark, fuzzy, alias_table, threshold=0.3)
    assert base.collect()[0].entity_id == "ent:a:corpb"  # lexicographic tie

    linked = link_fuzzy_mentions(
        spark, fuzzy, alias_table, threshold=0.3, context_bonus=bonus
    )
    r = linked.collect()[0]
    assert r.entity_id == "ent:z:corpa"  # the web's prior broke the tie
    assert abs(r.link_score - base.collect()[0].link_score) < 1e-12

    # containment: the prior cannot admit a below-threshold link
    none = link_fuzzy_mentions(
        spark, fuzzy, alias_table, threshold=0.999, context_bonus=bonus
    )
    assert none.count() == 0
