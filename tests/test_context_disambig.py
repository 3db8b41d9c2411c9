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
