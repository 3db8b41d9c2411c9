"""Exact phrase search via positional postings — the IR-index op that
needs token POSITIONS, not just term frequencies (tx_postings covers the
df/tf index; this is the adjacency layer on top).

Plan shape at 10^12 docs: tokenize with posexplode (map-only, JVM-side),
filter to the phrase's terms BEFORE any shuffle (the phrase acts as its
own pushdown — postings for 2-3 terms, not the whole vocabulary), then
one equi-join per adjacency on (doc_id, expected_position). No range
condition, no window, no Python: k-term phrases cost k-1 co-partitioned
joins whose keys all include doc_id, so AQE plans them as one exchange
chain. This is how a Lucene-style phrase query lowers onto a relational
engine (positional postings intersection — Manning et al. IR book §2.4,
public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_matches(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, n_matches) for documents whose whitespace tokens contain
    the exact consecutive `phrase`; n_matches counts occurrences."""
    if len(phrase) < 2:
        raise ValueError("phrase must have at least 2 terms")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    # anchor on the first term's positions, then intersect each following
    # term's postings at pos + offset
    cur = toks.where(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for off, term in enumerate(phrase[1:], start=1):
        nxt = toks.where(F.col("term") == term).select(
            "doc_id", (F.col("pos") - off).alias("p0")
        )
        cur = cur.join(nxt, ["doc_id", "p0"])
    return cur.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matches"))
