"""Structured markup metadata extraction (E15): <title> + OpenGraph tags
into a typed map, JVM-side only (reference analog: decorator-config
attribute parsing, javascript.py:254-416)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.extract.metadata import page_meta_rows, with_page_meta

HTML = (
    b'<html><head><title>Acme buys Globex</title>'
    b'<meta property="og:title" content="Acme buys Globex (og)"/>'
    b'<meta property="og:site_name" content="wire">'
    b'<meta property="og:locale" content="en">'
    b"</head><body><p>body text</p></body></html>"
)


def test_page_meta_map(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    got = with_page_meta(df).select("page_meta").first()[0]
    assert got == {
        "title": "Acme buys Globex",
        "og:title": "Acme buys Globex (og)",
        "og:site_name": "wire",
        "og:locale": "en",
    }


def test_page_meta_missing_and_duplicate(spark):
    rows = [
        ("no_meta", b"<html><body><p>x</p></body></html>"),
        (
            "dup",
            b'<head><meta property="og:locale" content="de">'
            b'<meta property="og:locale" content="fr"></head>',
        ),
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = {r.url: r.page_meta for r in with_page_meta(df).collect()}
    assert out["no_meta"] == {"title": ""}  # absent title -> empty string
    assert out["dup"]["og:locale"] == "fr"  # last occurrence wins


def test_page_meta_rows_shape(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    rows = page_meta_rows(df).toPandas()
    assert set(rows.columns) == {"url", "meta_key", "meta_value"}
    assert len(rows) == 4
    assert set(rows.meta_key) == {"title", "og:title", "og:site_name", "og:locale"}


def test_page_meta_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    plan = with_page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the extraction plan
