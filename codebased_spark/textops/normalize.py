"""Unicode NFC normalization — the canonical-form pass before
tokenization and hashing.

Crawl text mixes precomposed ('é') and combining ('e' + U+0301) forms of
the same grapheme; every downstream exact operation (content hashes,
exact dedup, token counts, gazetteer matching) silently splits on the
difference unless the corpus is normalized first, which is why NFC is
the first line of every real cleaning pipeline.

The JVM SQL surface has no normalizer, so this is one of the repo's few
deliberate Python stages: an Arrow-batched pandas UDF over
unicodedata.normalize('NFC', ...) — vectorized batch transfer, never
per-row Python (the build rule). DuckDB ships nfc_normalize natively,
so the driver row is value-checked against an independent ICU-grade
implementation — a stronger oracle than restating our own code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nfc_udf():
    # built lazily: pandas_udf resolves its return type against the
    # active session, so decorating at import time would require one
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):  # no annotations: future-annotations strings would
        import unicodedata  # defeat pandas_udf's signature inspection

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return pandas_udf(_nfc, "string")


def nfc_normalize_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_nfc, n_chars_before, n_chars_after, changed): normalized
    text plus the audit columns a cleaning report aggregates."""
    nfc = _nfc_udf()
    return (
        docs.select(
            F.col(id_col),
            F.col(text_col).alias("_orig"),
            nfc(F.col(text_col)).alias("text_nfc"),
        )
        .select(
            id_col,
            "text_nfc",
            F.length("_orig").alias("n_chars_before"),
            F.length("text_nfc").alias("n_chars_after"),
            (F.col("text_nfc") != F.col("_orig")).cast("int").alias("changed"),
        )
    )
