"""Unicode script census (textops/scripts.py)."""

from __future__ import annotations

from codebased_spark.textops.scripts import script_census


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.doc_id: r for r in script_census(df).collect()}


def test_counts_and_dominant_per_script(spark):
    got = _run(
        spark,
        [
            (1, "plain ascii text"),
            (2, "данные и веб"),
            (3, "数据网页"),
            (4, "بيانات"),
        ],
    )
    assert got[1].dominant_script == "latin" and not got[1].is_multiscript
    assert got[2].dominant_script == "cyrillic" and got[2].n_cyrillic == 10
    assert got[3].dominant_script == "han" and got[3].n_han == 4
    assert got[4].dominant_script == "arabic" and got[4].n_arabic == 6


def test_homoglyph_mix_flags_multiscript(spark):
    # Latin 'pay' + Cyrillic 'раl' lookalikes — the spam shape the census
    # exists to catch
    got = _run(spark, [(1, "payраl login")])
    assert got[1].is_multiscript
    assert got[1].n_latin > 0 and got[1].n_cyrillic == 2


def test_tie_break_precedence_is_latin_first(spark):
    got = _run(spark, [(1, "ab яж"), (2, "")])
    assert got[1].n_latin == got[1].n_cyrillic == 2
    assert got[1].dominant_script == "latin"
    # empty text: all zero counts -> latin by precedence, single-script
    assert got[2].dominant_script == "latin" and not got[2].is_multiscript
