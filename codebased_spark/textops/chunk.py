"""Fixed-size token chunking with overlap — the pre-tokenization splitter.

Training and embedding pipelines consume fixed-window chunks, not whole
documents: a chunker slices each document's token stream into windows of
`chunk_tokens` tokens advancing by `chunk_tokens - overlap`, so adjacent
chunks share `overlap` tokens of context. Deterministic spec (matching
the SQL oracle exactly): chunk starts are 1, 1+stride, 1+2*stride, ...
up to max(n_tokens - overlap, 1) — every token is covered, the tail
chunk is never smaller than overlap+1 tokens, and a short document gets
exactly one chunk.

Scale shape: pure map-side — split, sequence, posexplode, slice are all
whole-stage-codegen JVM expressions; no shuffle at all, so the operator
scales with scan bandwidth (the same no-shuffle property quality scoring
has). Skew is bounded by the longest single document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).

    chunk_idx is 0-based; chunk_start is the 1-based token offset.
    Documents with no tokens produce no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = (
        docs.select(F.col(id_col), w.alias("w"))
        .where(F.size("w") > 0)
        .select(
            id_col,
            "w",
            F.sequence(
                F.lit(1),
                F.greatest(F.size("w") - overlap, F.lit(1)),
                F.lit(stride),
            ).alias("starts"),
        )
    )
    return base.select(
        F.col(id_col),
        F.posexplode("starts").alias("chunk_idx", "chunk_start"),
        F.col("w"),
    ).select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.least(
            F.lit(chunk_tokens), F.size("w") - F.col("chunk_start") + 1
        ).alias("n_chunk_tokens"),
        F.array_join(
            F.slice("w", F.col("chunk_start"), chunk_tokens), " "
        ).alias("chunk_text"),
    )
