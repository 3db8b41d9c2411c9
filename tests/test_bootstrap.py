"""DIPRE relation bootstrapping (extract/bootstrap.py)."""

from __future__ import annotations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_pattern_induction_requires_distinct_seed_support(spark):
    from codebased_spark.extract.bootstrap import induce_patterns, token_triples

    seeds = spark.createDataFrame(
        [("Acme", "Dallas"), ("Globex", "Austin")], ["subj", "obj"]
    )
    docs = _docs(
        spark,
        ["Acme headquartered Dallas . Globex headquartered Austin .",
         # 'acquired' appears with ONE seed pair only (twice!) -> rejected
         "Acme acquired Dallas . Acme acquired Dallas ."],
    )
    got = {
        r.pattern: r.n_seed_pairs
        for r in induce_patterns(token_triples(docs), seeds).collect()
    }
    assert got == {"headquartered": 2}


def test_new_pairs_extracted_seeds_excluded(spark):
    from codebased_spark.extract.bootstrap import bootstrap_new_pairs

    seeds = spark.createDataFrame(
        [("Acme", "Dallas"), ("Globex", "Austin")], ["subj", "obj"]
    )
    docs = _docs(
        spark,
        ["Acme headquartered Dallas . Globex headquartered Austin .",
         "Initech headquartered Boston .",
         "Initech headquartered Boston . Umbra visited Paris ."],
    )
    got = {
        (r.subj, r.pattern, r.obj): r.n_docs
        for r in bootstrap_new_pairs(docs, seeds).collect()
    }
    # the new pair is found with doc support 2; seed pairs are anti-joined
    # away; 'visited' was never learned
    assert got == {("Initech", "headquartered", "Boston"): 2}


def test_entity_shape_filters_lowercase_and_middle(spark):
    from codebased_spark.extract.bootstrap import token_triples

    docs = _docs(spark, ["acme headquartered Dallas . Acme Big Dallas ."])
    rows = {
        (r.subj, r.middle, r.obj) for r in token_triples(docs).collect()
    }
    # lowercase subj rejected; capitalized middle ('Big') rejected
    assert ("acme", "headquartered", "Dallas") not in rows
    assert ("Acme", "Big", "Dallas") not in rows
