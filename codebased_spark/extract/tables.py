"""HTML table extraction — structured rows out of web markup.

The WebTables lineage (Cafarella et al., VLDB'08): relational data on
the web overwhelmingly lives in <table> markup, and harvesting it is a
standard KG-population source alongside free-text triples (reference
analog: the structured extractors that read declarations rather than
prose, SURVEY.md E14/E15).

One pass of nested JVM regexps — tables, then rows, then cells, then a
tag-strip per cell — entirely inside Catalyst expressions (regexp over
binary-cast html; transform over the extracted arrays). No Python
anywhere; the output is fully relational (url, table_idx, row_idx,
col_idx, cell) so it joins/aggregates like any other fact table.

Heuristic scope (documented): nested tables inside a cell are not
recursed into — the inner markup is stripped with the other tags (layout
tables-within-tables are presentation, and a single non-backtracking
pass is what scales). <th> and <td> both count as cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?i): real-web markup carries uppercase TABLE/TR/TD (VERDICT r3 top task)
_TABLE_RE = "(?is)<table\\b[^>]*>(.*?)</table\\s*>"
_ROW_RE = "(?is)<tr\\b[^>]*>(.*?)</tr\\s*>"
_CELL_RE = "(?is)<t[dh]\\b[^>]*>(.*?)</t[dh]\\s*>"


def _clean(cell: Column) -> Column:
    stripped = F.regexp_replace(cell, "(?s)<[^>]*>", "")
    return F.trim(F.regexp_replace(stripped, "\\s+", " "))


def tables_col(html_col: Column) -> Column:
    """array<array<array<string>>>: tables -> rows -> cleaned cells."""
    h = html_col.cast("string")
    return F.transform(
        F.regexp_extract_all(h, F.lit(_TABLE_RE), 1),
        lambda t: F.transform(
            F.regexp_extract_all(t, F.lit(_ROW_RE), 1),
            lambda r: F.transform(
                F.regexp_extract_all(r, F.lit(_CELL_RE), 1), _clean
            ),
        ),
    )


def html_table_cells(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, table_idx, row_idx, col_idx, cell) — 0-based indexes, rows
    with no cells (separator <tr>s) dropped; EMPTY cells kept (they are
    positional placeholders a table consumer needs). Property-tested
    against an independent html.parser reference (test_markup_spec.py)."""
    t = pages.select(
        "url", F.posexplode(tables_col(F.col(html_col))).alias("table_idx", "_t")
    )
    r = t.select(
        "url", "table_idx", F.posexplode("_t").alias("row_idx", "_r")
    )
    return (
        r.select(
            "url", "table_idx", "row_idx",
            F.posexplode("_r").alias("col_idx", "cell"),
        )
    )


def table_triples(cells: DataFrame) -> DataFrame:
    """WebTables-style triple lifting (Cafarella et al. 2008): row 0 is
    the header, column 0 of each data row is the row's entity key, and
    every other cell becomes (subj=key, pred=header[col], obj=cell) —
    the tables-to-KG step that turns relational web markup into edges
    the graph can join with text-derived triples.

    Input: the (url, table_idx, row_idx, col_idx, cell) relation from
    html_table_cells. Two narrow equi-joins keyed on (url, table_idx,
    col_idx)/(url, table_idx, row_idx) — header and key sides are
    table-count-sized, never page-content-sized."""
    hdr = cells.where(F.col("row_idx") == 0).select(
        "url", "table_idx", "col_idx", F.col("cell").alias("pred")
    )
    keys = cells.where((F.col("row_idx") > 0) & (F.col("col_idx") == 0)).select(
        "url", "table_idx", "row_idx", F.col("cell").alias("subj")
    )
    vals = cells.where((F.col("row_idx") > 0) & (F.col("col_idx") > 0))
    return (
        vals.join(hdr, ["url", "table_idx", "col_idx"])
        .join(keys, ["url", "table_idx", "row_idx"])
        .select("url", "subj", "pred", F.col("cell").alias("obj"))
    )


# definition lists — the infobox-style key/value markup family
_DL_RE = "(?is)<dl\\b[^>]*>(.*?)</dl\\s*>"
_DT_DD_RE = "(?is)<dt\\b[^>]*>(.*?)</dt\\s*>\\s*<dd\\b[^>]*>(.*?)</dd\\s*>"


def definition_pairs(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, dl_idx, key, value): <dt>/<dd> pairs from definition lists —
    the infobox-style key-value markup family beside tables/JSON-LD/
    microdata. Case/attribute tolerant per the house markup rule; nested
    markup inside keys/values is stripped by the shared _clean. Map-only
    regexps in codegen; one explode, no shuffle."""
    h = F.col(html_col).cast("string")
    dls = F.regexp_extract_all(h, F.lit(_DL_RE), 1)

    def pairs_of(dl):
        matches = F.regexp_extract_all(dl, F.lit(_DT_DD_RE), 0)
        return F.transform(
            matches,
            lambda m: F.struct(
                _clean(F.regexp_extract(m, _DT_DD_RE, 1)).alias("key"),
                _clean(F.regexp_extract(m, _DT_DD_RE, 2)).alias("value"),
            ),
        )

    return (
        pages.select(
            F.col("url"),
            F.posexplode(F.transform(dls, pairs_of)).alias("dl_idx", "_kv"),
        )
        .select("url", "dl_idx", F.explode("_kv").alias("_p"))
        .select(
            "url", "dl_idx",
            F.col("_p.key").alias("key"), F.col("_p.value").alias("value"),
        )
        .where(F.col("key") != "")
    )
