"""Mojibake repair must be the exact inverse of the damage process, and
the detector must separate damaged from clean text."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.textops.mojibake import detect_mojibake, repair_mojibake

CLEAN = "café — naïve ’s and more café text économie über"


def _damage(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def test_repair_inverts_double_encoding(spark):
    rows = [
        (0, _damage(CLEAN)),
        (1, "plain ascii stays untouched"),
        (2, _damage("zwölf größe — ’quoted’ …")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_repaired for r in repair_mojibake(docs).collect()}
    assert got[0] == CLEAN
    assert got[1] == "plain ascii stays untouched"
    assert got[2] == "zwölf größe — ’quoted’ …"


def test_detector_separates_clean_from_damaged(spark):
    rows = [
        (0, _damage(CLEAN)),
        (1, "plain ascii"),
        # a single stray 'Ã' (one marker) stays under the 2-marker gate:
        # genuinely Latin-1 text with one accented char is not mojibake
        (2, "AndrÃ©"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_markers, r.is_mojibake)
           for r in detect_mojibake(docs).collect()}
    assert got[0][0] >= 4 and got[0][1]
    assert got[1] == (0, False)
    assert got[2] == (1, False)


def test_repair_leaves_single_marker_rows_alone(spark):
    docs = spark.createDataFrame([(0, "AndrÃ©")], "doc_id long, text string")
    got = repair_mojibake(docs).collect()[0]
    assert got.text_repaired == "AndrÃ©"
