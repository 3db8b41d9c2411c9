"""Microdata extraction (extract/microdata.py)."""

from __future__ import annotations

from codebased_spark.extract.microdata import microdata_items


def _pages(spark, html):
    return spark.createDataFrame([("u", html.encode())], ["url", "html"])


def test_scopes_props_and_tag_stripping(spark):
    html = """
    <html><body><p>prose</p>
    <div itemscope itemtype="https://schema.org/Person">
      <span itemprop="name">Ada  Lovelace</span>
      <span itemprop="jobTitle"><b>Mathematician</b></span>
    </div>
    <p itemscope><span itemprop="note">typeless</span></p>
    </body></html>"""
    got = {
        (r.item_idx, r.prop): (r.item_type, r.value)
        for r in microdata_items(_pages(spark, html)).collect()
    }
    assert got == {
        (0, "name"): ("https://schema.org/Person", "Ada Lovelace"),
        (0, "jobTitle"): ("https://schema.org/Person", "Mathematician"),
        (1, "note"): (None, "typeless"),
    }


def test_page_without_microdata_yields_nothing(spark):
    assert microdata_items(_pages(spark, "<p>plain itemprop text</p>")).count() == 0


def test_plan_is_pure_jvm(spark):
    df = microdata_items(
        _pages(spark, '<i itemscope><b itemprop="x">y</b></i>')
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
