"""Graph export sinks — N-Triples and graph-DB bulk-import CSV.

The reference materializes its graph INTO a graph database (Kuzu batch
inserts, config.py:61 batch size; Cypher surface on top). This engine's
canonical store is the parquet/manifest tables, but a user migrating
from the reference still needs their graph IN a graph tool — the two
standard interchange paths are:

- N-Triples (RDF): one `<subj> <pred> <obj> .` line per triple — the
  lingua franca every triple store and SPARQL engine loads.
- Bulk-import CSV pairs (nodes.csv + edges.csv with id/src/dst headers)
  — the COPY/neo4j-admin/kuzu-IMPORT fast path, which beats row-at-a-
  time inserts by orders of magnitude at any scale (the reference's own
  issue log records batch-insert failures at 10^5 rows; bulk import is
  the production answer).

Everything is expression-built strings + a distributed text/csv write —
no driver materialization, no Python; escaping follows each format's
spec (N-Triples IRI/literal escapes; CSV quoting via the writer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nt_literal_escape(col: Column) -> Column:
    """String-literal escaping per the N-Triples grammar — applies ONLY
    inside quoted literals, never inside IRIs (ADVICE r3)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


# characters an N-Triples IRIREF forbids (plus %, encoded first so encoded
# output never re-encodes): control/whitespace, <>"{}|^`\ and the quote
_IRI_ENCODE = [
    ("%", "%25"),
    (" ", "%20"), ("\t", "%09"), ("\n", "%0A"), ("\r", "%0D"),
    ("<", "%3C"), (">", "%3E"), ('"', "%22"), ("\\", "%5C"),
    ("{", "%7B"), ("}", "%7D"), ("|", "%7C"), ("^", "%5E"), ("`", "%60"),
]


def _iri(col: Column, base: str) -> Column:
    """IRI position: percent-encode every character the IRIREF production
    forbids (IRIs use %-encoding, NOT literal backslash escapes — a
    \\" inside <...> is a syntax error to a conforming loader)."""
    safe = col
    for ch, enc in _IRI_ENCODE:
        safe = F.replace(safe, F.lit(ch), F.lit(enc))
    return F.concat(F.lit(f"<{base}"), safe, F.lit(">"))


def _literal(col: Column) -> Column:
    return F.concat(F.lit('"'), _nt_literal_escape(col), F.lit('"'))


# an object is an IRI when it carries a scheme (every id this engine mints
# does: page:, ent:, http(s):, urn:); anything else is a plain literal —
# IRIs cannot represent arbitrary text values, literals can (ADVICE r3)
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"


def triples_to_ntriples(
    triples: DataFrame, base: str = "urn:kg:"
) -> DataFrame:
    """One-column frame of N-Triples lines for (subj, pred, obj) rows.

    subj/pred are always IRIs (pipeline-minted ids/urls); obj is an IRI
    when scheme-shaped and a quoted literal otherwise, so every line is
    loadable by a conforming RDF parser."""
    obj = F.when(
        F.col("obj").rlike(_SCHEME_RE), _iri(F.col("obj"), base)
    ).otherwise(_literal(F.col("obj")))
    return triples.select(
        F.concat_ws(
            " ",
            _iri(F.col("subj"), base),
            _iri(F.col("pred"), base),
            obj,
            F.lit("."),
        ).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str, base: str = "urn:kg:") -> None:
    triples_to_ntriples(triples, base).write.mode("overwrite").text(path)


def nodes_to_bulk_csv(nodes: DataFrame) -> DataFrame:
    """Flatten the nodes table to bulk-import columns (meta map ->
    key:value pairs joined with ';', the common CSV-safe convention)."""
    meta = F.when(
        F.col("meta").isNotNull(),
        F.array_join(
            F.transform(
                F.map_entries("meta"),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
            ),
            ";",
        ),
    )
    return nodes.select(
        F.col("id"), F.col("uid"), F.col("name"), F.col("type"),
        meta.alias("meta"),
    )


def edges_to_bulk_csv(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("src"), F.col("dst"), F.col("rel_type"),
        F.col("meta")["source_url"].alias("source_url"),
    )


def write_bulk_import(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """nodes.csv/ + edges.csv/ directories of headered CSV parts — the
    input shape of neo4j-admin import / kuzu COPY / DuckDB read_csv."""
    nodes_to_bulk_csv(nodes).write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/nodes.csv"
    )
    edges_to_bulk_csv(edges).write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/edges.csv"
    )
