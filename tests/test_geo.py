"""Geotag extraction (extract/geo.py)."""

from __future__ import annotations


def _extract(spark, htmls):
    from codebased_spark.extract.geo import extract_geo

    pages = spark.createDataFrame(
        [(f"u{i}", h.encode()) for i, h in enumerate(htmls)], ["url", "html"]
    )
    return {
        (r.url, r.tag, r.lat_mdeg, r.lon_mdeg) for r in extract_geo(pages).collect()
    }


def test_canonical_and_adversarial_forms(spark):
    got = _extract(
        spark,
        ['<meta name="geo.position" content="48.858;2.294"/>',
         "<META CONTENT='-33.86, 151.209' NAME='ICBM' X=\"1\"/>"],
    )
    assert got == {
        ("u0", "geo.position", 48858, 2294),
        ("u1", "icbm", -33860, 151209),
    }


def test_fraction_normalization_and_integers(spark):
    got = _extract(
        spark,
        ['<meta name="geo.position" content="10.5;-7"/>',        # short frac / none
         '<meta name="geo.position" content="1.23456;0.0005"/>'],  # long frac
    )
    assert got == {
        ("u0", "geo.position", 10500, -7000),
        ("u1", "geo.position", 1234, 0),
    }


def test_invalid_content_dropped(spark):
    got = _extract(
        spark,
        ['<meta name="geo.position" content="unknown"/>',
         '<meta name="geo.position" content="12.3"/>',   # missing lon
         '<meta name="author" content="1;2"/>'],          # wrong tag name
    )
    assert got == set()


def test_negative_zero_integer_part(spark):
    # "-0.500" must come out negative: sign is read from the string
    got = _extract(spark, ['<meta name="geo.position" content="-0.500;0.500"/>'])
    assert got == {("u0", "geo.position", -500, 500)}
