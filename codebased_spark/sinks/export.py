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


def _nt_escape(col: Column) -> Column:
    """Escape a string for an N-Triples IRI/literal position."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def _iri(col: Column, base: str) -> Column:
    # IRIs forbid spaces and angle brackets; percent-encode the worst
    # offenders (full RFC 3987 encoding belongs to a URI library, but the
    # ids this engine mints are already IRI-safe hashes/urls)
    safe = F.replace(col, F.lit(" "), F.lit("%20"))
    safe = F.replace(safe, F.lit("<"), F.lit("%3C"))
    safe = F.replace(safe, F.lit(">"), F.lit("%3E"))
    return F.concat(F.lit(f"<{base}"), safe, F.lit(">"))


def triples_to_ntriples(
    triples: DataFrame, base: str = "urn:kg:"
) -> DataFrame:
    """One-column frame of N-Triples lines for (subj, pred, obj) rows."""
    return triples.select(
        F.concat_ws(
            " ",
            _iri(_nt_escape(F.col("subj")), base),
            _iri(_nt_escape(F.col("pred")), base),
            _iri(_nt_escape(F.col("obj")), base),
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
