"""Quantized-NB classifier: must separate token-disjoint classes
perfectly, and its integer scores must equal a pure-Python recompute of
the documented bit-length formula."""

from __future__ import annotations

import pytest

from codebased_spark.textops.classify import nb_classify, nb_train


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    # class "code": code-ish vocabulary; class "prose": prose vocabulary
    for i in range(12):
        rows.append((i, "code", "def class import return lambda yield def"))
        rows.append((100 + i, "prose", "the quick brown fox jumps over dog"))
    # held-out docs, one clearly of each class, one mixed leaning code
    tests = [
        (200, "def import return return", "code"),
        (201, "the quick fox the dog", "prose"),
        (202, "def the import class", "code"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    test = spark.createDataFrame(
        [(i, t) for i, t, _ in tests], "doc_id long, text string"
    )
    return train, test, {i: want for i, _, want in tests}


def test_separable_classes_classified_perfectly(labeled):
    train, test, want = labeled
    got = {
        r.doc_id: r.pred_label
        for r in nb_classify(train, test, label_col="lang").collect()
    }
    assert got == want


def test_scores_match_python_formula(labeled):
    train, test, _ = labeled
    cnt_df, classes_df, vocab, n_train = nb_train(train, label_col="lang")
    cnt = {(r.label, r.w): r.cnt for r in cnt_df.collect()}
    cls = {r.label: (r.tot, r.ndocs) for r in classes_df.collect()}
    docs = {r.doc_id: r.text.split() for r in test.collect()}
    want = {}
    for doc_id, toks in docs.items():
        best = None
        for label, (tot, ndocs) in cls.items():
            s = sum(
                (cnt.get((label, w), 0) + 1).bit_length()
                - (tot + vocab).bit_length()
                for w in toks
            )
            s += ndocs.bit_length() - n_train.bit_length()
            key = (-s, label)
            if best is None or key < best:
                best = key
        want[doc_id] = (best[1], -best[0])
    got = {
        r.doc_id: (r.pred_label, r.best_score)
        for r in nb_classify(train, test, label_col="lang").collect()
    }
    assert got == want
