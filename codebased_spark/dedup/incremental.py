"""Incremental near-dup detection: a new crawl batch vs the standing index.

Production dedup is never one-shot: every recrawl delivers a batch that
must be checked against the ALREADY-DEDUPED corpus without re-hashing
it. The standing artifact is the LSH bucket table (dedup/minhash.py's
(doc, band_idx, band_hash) rows — O(b*N), persisted once, appended per
batch); an incoming batch is shingled and banded alone, probes the
index with one bucket equi-join, and only the candidates' shingle
arrays are fetched for exact verification. Cost per batch is
O(b*|batch| + candidates), independent of corpus size — the property
that makes weekly dedup of a 10^12-doc corpus feasible.

Reference analog: the reference's incremental updater skips files whose
content hash is unchanged (incremental.py:159-274) — an exact-identity
index probe; this is the same probe generalized to near-identity.

The batch's INTERNAL duplicates are deliberately out of scope here (run
minhash_near_dupes on the batch alone, it is small); this operator
answers "which new docs duplicate the corpus", which is what decides
admission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.minhash import (
    DEFAULT_BANDS,
    DEFAULT_K,
    _shingled,
    lsh_buckets,
    with_minhash,
)
from codebased_spark.util import round_stable


def build_minhash_index(
    docs: DataFrame,
    n: int = 3,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persistable standing index: (doc, band_idx, band_hash)."""
    return lsh_buckets(
        with_minhash(docs, n=n, k=k, id_col=id_col, text_col=text_col),
        bands=bands,
        k=k,
    )


def incremental_minhash_dupes(
    new_docs: DataFrame,
    index_docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_new, doc_old, jaccard): new-batch docs near-duplicating the
    standing corpus at >= threshold. Exact given candidate recall (the
    same b/r margin as minhash_near_dupes)."""
    idx_buckets = build_minhash_index(
        index_docs, n=n, k=k, bands=bands, id_col=id_col, text_col=text_col
    )
    new_buckets = build_minhash_index(
        new_docs, n=n, k=k, bands=bands, id_col=id_col, text_col=text_col
    )
    cand = (
        new_buckets.alias("a")
        .join(idx_buckets.alias("b"), ["band_idx", "band_hash"])
        .select(F.col("a.doc").alias("doc_new"), F.col("b.doc").alias("doc_old"))
        .distinct()
    )
    sh_new = _shingled(new_docs, n, id_col, text_col).select(
        F.col("doc").alias("doc_new"), F.col("shingles").alias("sh_n")
    )
    sh_old = _shingled(index_docs, n, id_col, text_col).select(
        F.col("doc").alias("doc_old"), F.col("shingles").alias("sh_o")
    )
    return (
        cand.join(sh_new, "doc_new")
        .join(sh_old, "doc_old")
        .withColumn("inter", F.size(F.array_intersect("sh_n", "sh_o")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_n") + F.size("sh_o") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            "doc_new", "doc_old", round_stable(F.col("jaccard")).alias("jaccard")
        )
    )
