"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (the part that must be right at 100 TB): media lives as a
`binary` column beside typed metadata; decode / feature-extract runs as an
Arrow-batched `mapInPandas` stage so bytes cross the JVM<->Python boundary
once per batch, never per row; downstream everything is columnar again.

The actual pixel/sample decode is STUBBED here — the image/audio libraries
are not in this container. `_decode_image/_decode_audio/_decode_video`
raise NotImplementedError when `real=True`; the default deterministic fake
derives metadata from md5(payload) so the plumbing (schema, batching,
partitioning, UDF signature) is real and test-covered, and the fake is
reproducible on any SQL oracle via md5().
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

_MEDIA_TYPES = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    (doc_id, media_type, payload binary). Payload = utf-8 text bytes —
    an opaque blob as far as the decode stage is concerned."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _decode_image(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:  # pragma: no cover - requires PIL, not in this container
        raise NotImplementedError(
            "real image decode needs PIL/opencv; install and implement here"
        )
    h = hashlib.md5(payload).hexdigest()
    return 1 + int(h[:4], 16) % 4096, 1 + int(h[4:8], 16) % 4096, 0


def _decode_audio(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:  # pragma: no cover
        raise NotImplementedError("real audio decode needs soundfile/ffmpeg")
    h = hashlib.md5(payload).hexdigest()
    return 0, 0, 1 + int(h[8:14], 16) % 600000


def _decode_video(payload: bytes, real: bool) -> tuple[int, int, int]:
    if real:  # pragma: no cover
        raise NotImplementedError("real video decode needs ffmpeg frame sampling")
    h = hashlib.md5(payload).hexdigest()
    return 1 + int(h[:4], 16) % 4096, 1 + int(h[4:8], 16) % 4096, 1 + int(h[8:14], 16) % 600000


_DECODERS = {"image": _decode_image, "audio": _decode_audio, "video": _decode_video}


def media_metadata(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode/probe each payload -> typed metadata rows (MEDIA_SCHEMA).

    mapInPandas: one Arrow batch in, one pandas frame out — the per-blob
    Python work is amortized over ~4k-row batches; at cluster scale this
    stage scales linearly with executors and holds only a batch in memory.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _DECODERS[mt](bytes(pl), real)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            w, h, d = zip(*metas) if metas else ((), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": pd.Series(w, dtype="int64"),
                    "height": pd.Series(h, dtype="int64"),
                    "duration_ms": pd.Series(d, dtype="int64"),
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)
