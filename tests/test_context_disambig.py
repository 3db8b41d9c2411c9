"""Context-feature disambiguation (link/context.py)."""

from __future__ import annotations

from codebased_spark.extract.contexts import mention_windows
from codebased_spark.link.context import (
    disambiguate_by_context,
    entity_context_profiles,
)

# "alpha" -> e1 and "beta" -> e2 are unambiguous (they build profiles);
# "xx" is ambiguous between e1 and e2 and must be resolved by context.
GAZ = [
    ("alpha", "e1", "T"),
    ("beta", "e2", "T"),
    ("xx", "e1", "T"),
    ("xx", "e2", "T"),
]


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha sunny sunny ridge"),  # e1 profile: sunny x2, ridge
            (2, "beta rainy coast"),  # e2 profile: rainy, coast
            (3, "sunny xx ridge"),  # overlaps e1's profile -> e1
            (4, "rainy xx coast"),  # overlaps e2's profile -> e2
            (5, "xx unseen words"),  # zero overlap both -> min id e1
        ],
        ["doc_id", "text"],
    )
    gaz = spark.createDataFrame(GAZ, ["surface_form", "canonical_id", "entity_type"])
    return docs, gaz


def test_profiles_exclude_ambiguous_surfaces(spark):
    docs, gaz = _fixture(spark)
    ctxs = mention_windows(docs, gaz, width=40)
    prof = entity_context_profiles(ctxs, gaz)
    got = {(r.canonical_id, r.token): r.weight for r in prof.collect()}
    # from doc 1 only (alpha) and doc 2 only (beta); docs 3-5 contain no
    # unambiguous surface, so their windows feed nothing
    assert got == {
        ("e1", "sunny"): 2,
        ("e1", "ridge"): 1,
        ("e2", "rainy"): 1,
        ("e2", "coast"): 1,
    }


def test_disambiguation_argmax_and_tiebreak(spark):
    docs, gaz = _fixture(spark)
    ctxs = mention_windows(docs, gaz, width=40)
    out = {
        r.doc_id: (r.best_id, r.best_score, r.n_candidates)
        for r in disambiguate_by_context(ctxs, gaz).collect()
    }
    # doc 3 window tokens {sunny, ridge}: e1 scores 2+1=3, e2 scores 0
    # doc 4 window tokens {rainy, coast}: e2 scores 2, e1 scores 0
    # doc 5 window tokens share nothing: 0-0 tie -> smallest id e1
    assert out == {
        3: ("e1", 3, 2),
        4: ("e2", 2, 2),
        5: ("e1", 0, 2),
    }


def test_context_link_bonus_cosine(spark):
    from codebased_spark.link.context import context_link_bonus

    pages = spark.createDataFrame(
        [
            ("u1", "alpha riverside Acme Corpa mills"),
            ("u2", "xx riverside corpx mills yy"),
        ],
        ["url", "text"],
    )
    mentions = spark.createDataFrame(
        [
            ("u1", "Acme Corpa", 16, 26, True),
            ("u2", "corpx", 13, 18, False),
        ],
        ["url", "surface", "mstart", "mend", "exact"],
    )
    exact_map = spark.createDataFrame(
        [("Acme Corpa", "e1", "Org", 1.0)],
        ["surface", "entity_id", "entity_type", "link_score"],
    )
    rows = context_link_bonus(pages, mentions, exact_map).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.surface, r.entity_id) == ("corpx", "e1")
    # e1 profile {alpha, riverside, mills}; surface {xx, riverside, mills,
    # yy}: dot = 2, norms sqrt(3) and 2 -> 1/sqrt(3)
    assert abs(r.ctx_sim - 1 / 3**0.5) < 1e-12


def test_context_bonus_flips_exact_name_tie(spark):
    """Two candidates whose TF-IDF char-ngram scores are EXACTLY tied by
    construction (symmetric names): the default tie-break picks the
    smaller entity_id; the context bonus re-ranks without changing the
    name score or admitting below-threshold links."""
    from codebased_spark.link.alias import build_alias_table, link_fuzzy_mentions

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
    r0 = base.collect()[0]
    assert r0.entity_id == "ent:a:corpb"  # lexicographic tie-break

    bonus = spark.createDataFrame(
        [("acme corpx", "ent:z:corpa", 0.9)], ["surface", "entity_id", "ctx_sim"]
    )
    with_ctx = link_fuzzy_mentions(
        spark, fuzzy, alias_table, threshold=0.3, context_bonus=bonus
    )
    r1 = with_ctx.collect()[0]
    assert r1.entity_id == "ent:z:corpa"  # context re-ranked the tie
    assert abs(r1.link_score - r0.link_score) < 1e-12  # name score untouched

    # the bonus can NOT rescue a below-threshold candidate
    none = link_fuzzy_mentions(
        spark, fuzzy, alias_table, threshold=0.999, context_bonus=bonus
    )
    assert none.count() == 0


def test_pipeline_context_features_keeps_pr(spark, corpus):
    """Golden P/R holds with the opt-in context feature on."""
    from codebased_spark.graph.pipeline import extract_triples

    pages = spark.createDataFrame(corpus.pages)
    gaz = spark.createDataFrame(corpus.gazetteer)
    res = extract_triples(spark, pages, gaz, context_features=True)
    pred = set(tuple(r) for r in res.triples.collect())
    gold = set(map(tuple, corpus.golden_triples.itertuples(index=False)))
    tp = len(pred & gold)
    assert tp / max(len(pred), 1) >= 0.95
    assert tp / max(len(gold), 1) >= 0.95
    res.release()
