"""HTML table extraction (extract/tables.py)."""

from __future__ import annotations

from codebased_spark.extract.tables import html_table_cells


def _pages(spark, html):
    return spark.createDataFrame([("u", html.encode())], ["url", "html"])


def test_multiline_tables_and_tag_stripping(spark):
    html = """
    <html><body><p>intro</p>
    <table class="data">
      <tr><th> Col A </th><th>Col B</th></tr>
      <tr><td><a href="/x"><b>linked  text</b></a></td>
          <td>plain</td></tr>
    </table>
    <table><tr><td>second</td></tr></table>
    </body></html>"""
    got = {
        (r.table_idx, r.row_idx, r.col_idx): r.cell
        for r in html_table_cells(_pages(spark, html)).collect()
    }
    assert got == {
        (0, 0, 0): "Col A",
        (0, 0, 1): "Col B",
        (0, 1, 0): "linked text",
        (0, 1, 1): "plain",
        (1, 0, 0): "second",
    }


def test_no_tables_yields_no_rows(spark):
    assert html_table_cells(_pages(spark, "<p>no tables here</p>")).count() == 0


def test_plan_is_pure_jvm(spark):
    df = html_table_cells(_pages(spark, "<table><tr><td>x</td></tr></table>"))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_table_triples_lifting(spark):
    from codebased_spark.extract.tables import html_table_cells, table_triples

    html = (
        "<html><body><table>"
        "<tr><th>name</th><th>pop</th><th>cap</th></tr>"
        "<tr><td>France</td><td>68</td><td>Paris</td></tr>"
        "<tr><td>Japan</td><td>125</td><td>Tokyo</td></tr>"
        "</table></body></html>"
    ).encode()
    pages = spark.createDataFrame([("https://x.org/1", html)], ["url", "html"])
    got = {
        (r.subj, r.pred, r.obj)
        for r in table_triples(html_table_cells(pages)).collect()
    }
    assert got == {
        ("France", "pop", "68"), ("France", "cap", "Paris"),
        ("Japan", "pop", "125"), ("Japan", "cap", "Tokyo"),
    }


def test_definition_pairs(spark):
    from codebased_spark.extract.tables import definition_pairs

    html = (
        "<html><body>"
        "<dl><dt>k1</dt><dd>v1</dd><dt>k2</dt><dd><i>v2</i></dd></dl>"
        "<DL CLASS='m'><DT>K3</DT> <DD> v3 spaced </DD></DL>"
        "<dl><dt></dt><dd>dropped: empty key</dd></dl>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame([("https://x.org/1", html)], ["url", "html"])
    got = {
        (r.dl_idx, r.key, r.value) for r in definition_pairs(pages).collect()
    }
    assert got == {
        (0, "k1", "v1"),
        (0, "k2", "v2"),        # nested markup stripped
        (1, "K3", "v3 spaced"),  # uppercase form + whitespace collapse
    }
