"""NFC normalization (textops/normalize.py) — vs Python unicodedata and
the vectorized-plan contract. Literals use explicit escapes so the
decomposed/precomposed distinction survives any editor."""

from __future__ import annotations

import unicodedata

from codebased_spark.textops.normalize import nfc_normalize_docs

DECOMPOSED = "cafe\u0301 time"      # e + combining acute
PRECOMPOSED = "caf\u00e9 time"     # precomposed e-acute
RING = "A\u030a ring"               # A + combining ring


def test_nfc_composition_and_audit_columns(spark):
    rows = [(1, DECOMPOSED), (2, PRECOMPOSED), (3, RING), (4, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text_nfc, r.n_chars_before, r.n_chars_after, r.changed)
        for r in nfc_normalize_docs(docs).collect()
    }
    for i, t in rows:
        expect = unicodedata.normalize("NFC", t)
        assert got[i][0] == expect
        assert got[i][1] == len(t) and got[i][2] == len(expect)
        assert got[i][3] == int(expect != t)
    assert got[1][3] == 1 and got[2][3] == 0
    assert got[3][0] == "\u00c5 ring"


def test_udf_is_arrow_batched_not_rowwise(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = (
        nfc_normalize_docs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
