"""Feature hashing (HashingTF) — fixed-dim sparse document vectors.

The hashing-trick vectorizer (Weinberger et al. 2009; Spark MLlib's
HashingTF): token -> stable hash bucket modulo a fixed dim, so the
vocabulary needs no global dictionary pass — the property that matters
at 10^12 documents, where even the distinct-token table is a shuffle you
would rather not pay. Output is the sparse (id, bucket, tf) triple
table downstream linear models / LSH / similarity joins consume.

Bucket hash: the first 8 hex chars of md5(token) parsed as an integer,
mod dim — md5 and hex-parse exist verbatim on both engines (same
portability trick as kmeans_fit's md5 init), so the driver row is
value-checked bit-for-bit. Map-side hash + one (id, bucket) count
shuffle with map-side combine; token strings never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_tf(
    docs: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, tf): sparse hashed term frequencies, bucket < dim."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % dim
    )
    return (
        docs.select(F.col(id_col), F.explode(toks).alias("tok"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
